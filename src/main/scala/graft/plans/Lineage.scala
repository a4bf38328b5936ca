package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, ExprId}
import org.apache.spark.sql.catalyst.plans.logical.{Expand, Generate, LeafNode, LogicalPlan, Union}
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
      case e: Expand =>
        // unpivot/cube/rollup: output attrs are fresh references that
        // align POSITIONALLY with each projection row — lineage of
        // output i is the union of projections(·)(i)'s references
        val positional = e.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> e.projections.flatMap(proj =>
            proj(i).references.toSeq
              .flatMap(r => fromChildren.getOrElse(r.exprId, Set.empty[Source])))
            .toSet
        }.toMap
        fromChildren ++ positional
      case _ =>
        val childSources: Set[Source] = p.children.flatMap(_.output)
          .flatMap(a => fromChildren.getOrElse(a.exprId, Set.empty[Source]))
          .toSet
        val aliased = p.expressions.flatMap(_.collect {
          case al: Alias =>
            val refs = al.child.references.toSeq
              .flatMap(r => fromChildren.getOrElse(r.exprId, Set.empty[Source]))
              .toSet
            // a reference-free AGGREGATE (count(1), count_if over a
            // literal) still derives from the relation's rows, and a
            // reference-free SERIALIZER expression (invoke over
            // input[0] at a typed/object boundary — BoundReference,
            // not AttributeReference) derives from the lambda's input
            // relation — both get relation-level lineage. A
            // reference-free PLAIN alias is a literal: keep it empty
            // (the per-column constant-folding canary).
            val srcs =
              if (refs.nonEmpty) refs
              else if (al.child.exists(e =>
                e.isInstanceOf[org.apache.spark.sql.catalyst.expressions
                  .aggregate.AggregateExpression] ||
                e.isInstanceOf[org.apache.spark.sql.catalyst.expressions
                  .BoundReference])) childSources
              else refs
            al.exprId -> srcs
        })
        val base = fromChildren ++ aliased
        // typed/object boundaries (SerializeFromObject, MapPartitions,
        // mapGroups shapes): outputs are fresh attrs with NO Catalyst
        // reference chain to the inputs — map them coarsely to the
        // union of the child's sources ("derived from this relation"),
        // which is the honest answer at an opaque lambda. Alias-bound
        // constants are NOT caught here: an all-literal Alias is
        // already in `base` with an empty source set, keeping the
        // constant-folding canary per column intact.
        val missing = p.output.filterNot(a => base.contains(a.exprId))
        if (missing.isEmpty) base
        else if (childSources.isEmpty) base
        else base ++ missing.map(_.exprId -> childSources).toMap
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
