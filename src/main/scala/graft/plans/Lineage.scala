package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, ExprId}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LeafNode, LogicalPlan, Union}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage extracted from the ANALYZED logical plan —
  * the governance artifact a CDC/warehouse consumer wants next to the
  * data: for every output column, which leaf (table, column)s feed
  * it.
  *
  * Pre-optimizer on purpose: analysis still carries the user's names
  * and every edge they wrote; the optimizer can only prune columns
  * (removing edges that were real inputs) and rewrite expressions.
  * The walk is one bottom-up fold over the plan:
  *
  *  - leaf relations seed each output attribute with (table, column),
  *    the table name taken from the scan's root path;
  *  - `Alias` definitions (Project / Aggregate / Window expressions)
  *    map their new ExprId to the union of their referenced
  *    attributes' sources;
  *  - `Generate` maps every generator output to the generator's
  *    references (explode(split(text)) descends from `text`);
  *  - `Union` resolves positionally through every child branch;
  *  - everything else passes attributes through by ExprId.
  *
  * Driver-side metadata bounded by schema width × plan depth — the
  * plan is never executed and no data is read.
  */
object Lineage {

  /** (table, column) leaf coordinate. */
  type Source = (String, String)

  private def tableNameOf(leaf: LeafNode): String = leaf match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.headOption
          .map(_.getName.replaceAll("\\.[A-Za-z0-9]+$", ""))
          .getOrElse("unknown")
      case other => other.getClass.getSimpleName.stripSuffix("$")
    }
    case other => other.getClass.getSimpleName.stripSuffix("$")
  }

  private def walk(p: LogicalPlan): Map[ExprId, Set[Source]] = {
    val fromChildren =
      p.children.foldLeft(Map.empty[ExprId, Set[Source]]) { (acc, c) =>
        walk(c).foldLeft(acc) { case (m, (k, v)) =>
          m.updated(k, m.getOrElse(k, Set.empty) ++ v)
        }
      }
    p match {
      case leaf: LeafNode =>
        val t = tableNameOf(leaf)
        leaf.output.map(a => a.exprId -> Set[Source]((t, a.name))).toMap
      case u: Union =>
        val positional = u.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> u.children
            .flatMap(c => fromChildren.getOrElse(c.output(i).exprId, Set.empty))
            .toSet
        }.toMap
        fromChildren ++ positional
      case g: Generate =>
        val srcs = g.generator.references.toSeq
          .flatMap(r => fromChildren.getOrElse(r.exprId, Set.empty)).toSet
        fromChildren ++ g.generatorOutput.map(a => a.exprId -> srcs).toMap
      case _ =>
        val aliased = p.expressions.flatMap(_.collect {
          case al: Alias =>
            al.exprId -> al.child.references.toSeq
              .flatMap(r => fromChildren.getOrElse(r.exprId, Set.empty[Source]))
              .toSet
        })
        fromChildren ++ aliased
    }
  }

  /** Lineage edges `(output column, source table, source column)` for
    * `df`, sorted for determinism. */
  def lineage(df: DataFrame): Seq[(String, String, String)] = {
    val plan = org.apache.spark.sql.graftbridge.Bridge.analyzedPlan(df)
    val m = walk(plan)
    plan.output.flatMap(a => m.getOrElse(a.exprId, Set.empty)
      .toSeq.map { case (t, c) => (a.name, t, c) })
      .sorted
  }
}
