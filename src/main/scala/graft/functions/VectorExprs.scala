package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Tight-loop vector kernels as codegen'd Catalyst expressions.
  *
  * The composed higher-order-function renderings (`aggregate` over
  * `zip_with`) are semantically identical but interpret a lambda per
  * element and allocate an intermediate array per row — on an n²
  * pairwise workload that interpretation dominated the benchmark
  * (llm_dedup_embed: 38 s → ~2 s at sf0.1). These kernels loop over
  * the raw ArrayData with no allocation; accumulation is
  * left-to-right, so results stay bit-identical to both Spark
  * `aggregate` and DuckDB `list_reduce` folds (the oracle contract).
  */

/** graft_dot(array<double>, array<double>) → double */
case class DoubleArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires two array<double> arguments, got $other")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** graft_simhash64(array<long>) → long: per-bit ±1 votes over the
  * hashes, sign vector packed into one 64-bit fingerprint. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 requires array<long>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    VectorKernels.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.simhash64($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_simhash_text(array<string>) → long: seeded-FNV hash per
  * token + per-bit votes + sign packing in one kernel (fuses the
  * transform(toks, hash) stage into SimHash64). */
case class SimHashText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_text requires array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_text"

  override def nullSafeEval(input: Any): Any =
    VectorKernels.simhashText(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.simhashText($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_minhash(array<string>, k) → array<long>: the k MinHash
  * signature minima in one pass (k seeded FNV hashes per shingle,
  * seeds 0..k-1 — identical values to k separate
  * array_min(transform(...)) passes, without k interpreted lambda
  * traversals). */
case class MinHashArray(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) if k > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires array<string> and k > 0, got $other / k=$k")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    VectorKernels.minhash(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.minhash($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_shingles(array<string>, n) → array<string>: space-joined
  * n-gram shingles (requires numElements >= n; callers guard). */
case class ShingleArray(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) if n > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires array<string> and n > 0, got $other / n=$n")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    VectorKernels.shingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.shingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_shingles_sorted(array<string>, n) → array<string>:
  * ≡ array_sort(array_distinct(graft_shingles(toks, n))) fused into
  * one codegen'd kernel call — see [[VectorKernels.shinglesSorted]]
  * for why the fused form exists (the HOF pair keeps its Project out
  * of whole-stage codegen). */
case class ShingleArraySorted(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) if n > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles_sorted requires array<string> and n > 0, got $other / n=$n")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_shingles_sorted"

  override def nullSafeEval(input: Any): Any =
    VectorKernels.shinglesSorted(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.shinglesSorted($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_char_ngrams(string, n) → array<string>: all character
  * n-grams of the input in order, one O(len·n) pass (empty array when
  * the string is shorter than n). Exists because the declarative
  * rendering — `transform(sequence(1, len-2), i -> substr(s, i, 3))` —
  * is quadratic twice over: `substr` re-seeks the UTF-8 string from
  * the start per element, and any non-trivial expression the lambda
  * captures is re-evaluated per element (the repo's known HOF
  * hazard — see nearDupPairs). Indexing is by UTF-16 code unit, which
  * equals code points for BMP text (all fixture corpora); astral
  * chars would split into surrogate halves.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType if n > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_char_ngrams requires string and n > 0, got $other / n=$n")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_char_ngrams"

  override def nullSafeEval(input: Any): Any =
    VectorKernels.charNgrams(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.charNgrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_tokens(string) → array<string>: the engine tokenizer as ONE
  * codegen pass — lowercase, split on ASCII whitespace runs, and
  * segment CJK (Han/Hiragana/Katakana/Hangul script) codepoints into
  * their own tokens, so no-whitespace scripts yield per-character
  * unigrams instead of one giant token per document.
  *
  * On whitespace-delimited text the output is byte-identical to the
  * classic `split(lower(trim(regexp_replace(s, "\s+", " "))), " ")`
  * rendering (LlmSpec pins ≡ over the driver corpus): same `\s` set
  * (Java's ASCII class — U+00A0 etc. stay in-token like the regex),
  * same lowercase (UTF8String.toLowerCase, what Spark's `lower`
  * runs), same `[""]` on empty/all-space input. Exists as a kernel
  * because a regex alternation with script classes paid a per-char
  * script lookup on EVERY document of every tokens() consumer
  * (measured +75% on the x256 jaccard soak); here ASCII chars — the
  * entire Latin corpus — never reach the script check.
  */
case class CjkTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_tokens requires string, got $other")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override def nullSafeEval(input: Any): Any =
    VectorKernels.tokensCjk(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.tokensCjk($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_winnow_fps(string, k, w) → array<string>: the winnowing
  * fingerprint selector (Schleimer/Wilkerson/Aiken, SIGMOD 2003) as
  * ONE codegen pass per document — md5 every k-char substring, keep
  * the minimum hash of each sliding w-window of positions, return the
  * DISTINCT minima as 12-hex-char strings (first 6 md5 bytes),
  * unsigned-sorted (== lexicographic hex order).
  *
  * Value-identical to the SQL rendering
  * `array_distinct(transform(seq, i -> array_min(slice(hs, i, w))))`
  * over `hs = transform(seq, i -> substr(md5(substring(text, i, k)),
  * 1, 12))` — same codepoint-based substring semantics
  * (UTF8String), same md5 bytes, and 12 fixed lowercase hex digits
  * compare lexicographically exactly as the 48-bit value compares
  * unsigned. Exists as a kernel because the HOF rendering pays an
  * interpreted-lambda dispatch plus a NEW MessageDigest instance per
  * position (DigestUtils.md5Hex), and the explode+window rendering
  * shuffles one 12-byte-keyed row per character position through a
  * window sort + distinct exchange (measured superlinear at the x64
  * soak point). Here: one reused ThreadLocal digest, one primitive
  * long[] of 48-bit prefixes, a w-wide scan for minima, a HashSet
  * for dedup — per-document work only, nothing crosses a shuffle.
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType if k > 0 && w > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow_fps requires string and k,w > 0, got $other k=$k w=$w")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_winnow_fps"

  override def nullSafeEval(input: Any): Any =
    VectorKernels.winnowFps(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.winnowFps($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_window_hashes(array<string>, w) → array<struct<h1:bigint,
  * h2:bigint>>: two independent 64-bit rolling polynomial hashes of
  * EVERY w-token window of the token array, element i = the window
  * starting at position i+1 (1-based), empty when there are fewer
  * than w tokens.
  *
  * Exists for the ExactSubstr posting join (`llm_dedup_substring`):
  * materializing each window as its joined STRING costs ~w·avg_token
  * bytes per position at build time and again through the posting
  * shuffle (~136 B/row measured); the two-lane hash carries the same
  * join semantics in 16 B/row and never allocates the window text.
  * Window equality on the (h1, h2) pair is equivalent to equality of
  * the joined string because (a) tokens are whitespace-split so
  * `array_join(_, " ")` is injective on token sequences, and (b) the
  * two lanes run byte-distinct functions end to end — different FNV
  * offsets AND multipliers per token, different splitmix xor tweaks,
  * different rolling multipliers — so a false pair match is a
  * simultaneous collision of two independent 64-bit functions
  * (~2⁻¹²⁸, the same residual the md5-keyed `llm_dedup_canonical`
  * group key already accepts as exact). Rolling update is O(1) per
  * position (subtract the leaving token's term via the precomputed
  * R^(w-1), multiply, add the entering token), so the pass is O(n)
  * per document regardless of w.
  */
case class WindowHashes(child: Expression, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) if w > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_window_hashes requires array<string> and w > 0, got $other w=$w")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_window_hashes"

  override def nullSafeEval(input: Any): Any =
    VectorKernels.windowHashes(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.windowHashes($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_rpbands(array<double>, r, bands, seed) → array<long>:
  * banded random-hyperplane (sign-random-projection) LSH signature.
  * Bit t of r·bands total bits = sign of the projection of the vector
  * onto a Rademacher ±1 hyperplane derived from splitmix64(seed, t,
  * dim); bits pack r-per-band into `bands` longs. Two vectors at
  * angle θ agree on each bit with probability ≈ 1 − θ/π, so a banded
  * equi-join on (band_id, band_value) yields near-neighbor candidate
  * pairs without any corpus×corpus product — the same machinery as
  * the MinHash/SimHash text paths, for dense embeddings.
  */
case class RandomProjBands(child: Expression, r: Int, bands: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if r > 0 && r <= 64 && bands > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_rpbands requires array<double>, 0 < r <= 64, bands > 0; " +
        s"got $other / r=$r / bands=$bands")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rpbands"

  override def nullSafeEval(input: Any): Any =
    VectorKernels.rpBands(input.asInstanceOf[ArrayData], r, bands, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.rpBands($c, $r, $bands, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_best_centroid(array<double>, array<array<double>>) →
  * struct<idx:int, c_sim:double>: index of the nearest centroid (by
  * cosine; ties → lowest index) plus the clamped cosine itself, in
  * ONE codegen pass per row over the broadcast centroid array.
  *
  * This replaces the corpus×C crossJoin → row_number window argmax
  * (VERDICT r2 "What's wrong" #1): the corpus never fans out to n×C
  * rows and the assignment needs no shuffle at all. Arithmetic is
  * bit-identical to `clamp1(cosineCols(e, c))` — same left-to-right
  * dot folds, same NaN→0 and [-1,1] clamp — so assignment angles
  * match the window rendering exactly.
  */
case class BestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_best_centroid requires (array<double>, array<array<double>>), got $other")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("c_sim", DoubleType, nullable = false)))
  override def prettyName: String = "graft_best_centroid"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.bestCentroid(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.bestCentroid($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** graft_quant8(array<double>) → struct<scale:double, q:array<int>>:
  * symmetric per-vector int8 quantization — the embedding-compression
  * step of a training-data pipeline (4× smaller than float32, 8× than
  * the double widening). scale = max|x| / 127; q_i = floor(x_i/scale
  * + 0.5) (round-half-up, sign-symmetric enough for quantization and
  * bit-identical between Spark and the DuckDB oracle, unlike
  * banker's-rounding `round`). An all-zero vector gets scale 0 and
  * q = 0s. One fused pass; the declarative transform rendering would
  * re-evaluate the captured scale aggregate per element (the standing
  * HOF hazard — see CharNgrams).
  */
case class Quant8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_quant8 requires array<double>, got $other")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(IntegerType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "graft_quant8"

  override def nullSafeEval(input: Any): Any =
    VectorKernels.quant8(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.quant8($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_cos_centroids(array<double>, array<array<double>>) →
  * array<double>: clamped cosine to every centroid (array order), one
  * pass — feeds the per-probe bucket ranking without a window. */
/** graft_best_centroid_l2(array<double>, array<array<double>>) →
  * struct<idx:int, dist:double>: squared-L2 argmin over the centroid
  * list (ties → lowest idx) — the PQ subquantizer assignment. */
case class BestCentroidL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_best_centroid_l2 requires (array<double>, array<array<double>>), got $other")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("dist", DoubleType, nullable = false)))
  override def prettyName: String = "graft_best_centroid_l2"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.bestCentroidL2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.bestCentroidL2($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class CosCentroids(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_cos_centroids requires (array<double>, array<array<double>>), got $other")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_cos_centroids"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosCentroids(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.cosCentroids($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorKernels {

  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".toCharArray

  /** See [[WinnowFps]]. Returns the distinct sliding-window md5
    * minima of every k-char substring, 12 lowercase hex chars each,
    * unsigned-ascending (== lexicographic). Empty array when the
    * document has fewer than k + w − 1 chars (no full window).
    */
  def winnowFps(s: org.apache.spark.unsafe.types.UTF8String,
      k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    // char-start byte offsets (UTF8String substring semantics:
    // positions are codepoints, multi-byte chars are one position)
    var n = 0
    var b = 0
    while (b < bytes.length) {
      b += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(bytes(b))
      n += 1
    }
    val npos = n - k + 1
    if (npos < w)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val off = new Array[Int](n + 1)
    var i = 0
    b = 0
    while (b < bytes.length) {
      off(i) = b
      b += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(bytes(b))
      i += 1
    }
    off(n) = bytes.length
    // 48-bit md5 prefix per position — primitive, no boxing
    val md = md5Local.get()
    val fp = new Array[Long](npos)
    i = 0
    while (i < npos) {
      md.reset()
      md.update(bytes, off(i), off(i + k) - off(i))
      val d = md.digest()
      fp(i) = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
        ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
        ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
      i += 1
    }
    // sliding-window minima (48-bit values: signed compare == unsigned)
    val distinct = new java.util.HashSet[java.lang.Long]()
    i = 0
    val last = npos - w
    while (i <= last) {
      var m = fp(i)
      var j = i + 1
      val end = i + w
      while (j < end) {
        if (fp(j) < m) m = fp(j)
        j += 1
      }
      distinct.add(m)
      i += 1
    }
    val out = new Array[Long](distinct.size)
    val it = distinct.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out)
    val arr = new Array[Any](out.length)
    i = 0
    while (i < out.length) {
      val cs = new Array[Byte](12)
      var sh = 44
      var c = 0
      while (c < 12) {
        cs(c) = hexChars(((out(i) >>> sh) & 0xf).toInt).toByte
        sh -= 4
        c += 1
      }
      arr(i) = org.apache.spark.unsafe.types.UTF8String.fromBytes(cs)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  /** cosine clamped like clamp1: NaN (zero-norm side) → 0, then
    * [-1, 1] — value-identical to the Catalyst clamp1(cosineCols)
    * rendering (same fold order, same multiply order) */
  private def clampedCos(e: ArrayData, ne: Double, c: ArrayData): Double = {
    var cos = dot(e, c) / (ne * math.sqrt(dot(c, c)))
    if (java.lang.Double.isNaN(cos)) cos = 0.0
    if (cos > 1.0) cos = 1.0 else if (cos < -1.0) cos = -1.0
    cos
  }

  def bestCentroid(e: ArrayData, cents: ArrayData): InternalRow = {
    val ne = math.sqrt(dot(e, e))
    val n = cents.numElements()
    var bestI = 0
    var best = java.lang.Double.NEGATIVE_INFINITY
    var i = 0
    while (i < n) {
      val cos = clampedCos(e, ne, cents.getArray(i))
      if (cos > best) { best = cos; bestI = i } // strict > : ties → lowest idx
      i += 1
    }
    new GenericInternalRow(Array[Any](bestI, best))
  }

  /** L2 (squared-distance) argmin — the subquantizer metric product
    * quantization needs: cosine is scale-blind, so a subvector would
    * happily assign to a badly-scaled centroid. */
  def bestCentroidL2(e: ArrayData, cents: ArrayData): InternalRow = {
    val n = cents.numElements()
    val d = e.numElements()
    var bestI = 0
    var best = java.lang.Double.POSITIVE_INFINITY
    var i = 0
    while (i < n) {
      val c = cents.getArray(i)
      var s = 0.0
      var j = 0
      while (j < d) {
        val diff = e.getDouble(j) - c.getDouble(j)
        s += diff * diff
        j += 1
      }
      if (s < best) { best = s; bestI = i } // strict < : ties → lowest idx
      i += 1
    }
    new GenericInternalRow(Array[Any](bestI, best))
  }

  def cosCentroids(e: ArrayData, cents: ArrayData): ArrayData = {
    val ne = math.sqrt(dot(e, e))
    val n = cents.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = clampedCos(e, ne, cents.getArray(i)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** ADVICE r4: checkInputDataTypes accepts containsNull=true arrays
    * (the parquet-sourced embedding cast carries that flag even when
    * no element is ever null), so the kernels must not read a null
    * slot as 0.0/garbage silently — they reject it loudly instead. */
  private def noNulls(a: ArrayData, kernel: String): Unit = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"$kernel: null element at index $i — array<double> kernel inputs must be null-free")
      i += 1
    }
  }

  /** left-to-right fold — bit-compatible with aggregate/list_reduce */
  def dot(a: ArrayData, b: ArrayData): Double = {
    noNulls(a, "graft_dot"); noNulls(b, "graft_dot")
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def simhash64(hashes: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  /** value-identical to simhash64(transform(toks, seeded_hash(_, 0))) */
  def simhashText(toks: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val h = SeededFnvHash.hashUtf8(toks.getUTF8String(i), 0L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  def minhash(shingles: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      var j = 0
      while (j < k) {
        val h = SeededFnvHash.hashUtf8(s, j.toLong)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  /** See [[WindowHashes]]. Per-token base hashes are two byte-level
    * lanes that differ in offset basis, multiplier, AND splitmix xor
    * tweak (FNV is affine in its offset — two offsets with one
    * multiplier would leave the lanes linearly related for equal-
    * length tokens, collapsing the pair to 64 effective bits); the
    * window combine is a rolling polynomial mod 2⁶⁴ with a distinct
    * odd multiplier per lane.
    */
  def windowHashes(toks: ArrayData, w: Int): ArrayData = {
    val n = toks.numElements()
    val m = n - w + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val t1 = new Array[Long](n)
    val t2 = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      val b = if (s == null) Array.emptyByteArray else s.getBytes
      var h1 = 0xcbf29ce484222325L // FNV-1a offset basis
      var h2 = 0x9e3779b97f4a7c15L
      var j = 0
      while (j < b.length) {
        val x = b(j) & 0xffL
        h1 = (h1 ^ x) * 0x100000001b3L // FNV-1a prime
        h2 = (h2 ^ x) * 0x9ddfea08eb382d69L
        j += 1
      }
      t1(i) = mix(h1 ^ 0x5851f42d4c957f2dL)
      t2(i) = mix(h2 ^ 0x14057b7ef767814fL)
      i += 1
    }
    val R1 = 0xd6e8feb86659fd93L
    val R2 = 0xc2b2ae3d27d4eb4fL
    var rw1 = 1L
    var rw2 = 1L
    var k = 0
    while (k < w - 1) { rw1 *= R1; rw2 *= R2; k += 1 }
    val out = new Array[Any](m)
    var a1 = 0L
    var a2 = 0L
    i = 0
    while (i < w) { a1 = a1 * R1 + t1(i); a2 = a2 * R2 + t2(i); i += 1 }
    out(0) = new GenericInternalRow(Array[Any](a1, a2))
    var p = 1
    while (p < m) {
      a1 = (a1 - t1(p - 1) * rw1) * R1 + t1(p + w - 1)
      a2 = (a2 - t2(p - 1) * rw2) * R2 + t2(p + w - 1)
      out(p) = new GenericInternalRow(Array[Any](a1, a2))
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** splitmix64 finalizer — the per-(bit, dim) Rademacher source */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z ^= (z >>> 30); z *= 0xbf58476d1ce4e5b9L
    z ^= (z >>> 27); z *= 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Hyperplane sign matrices for [[rpBands]], cached per
    * (seed, nBits, d): the signs are a pure function of those three,
    * so deriving them per vector paid nBits·d splitmix64 mixes per
    * ROW (24k mixes/vector at the registered 16×24×64 operating
    * point) for bits that never change. Per-JVM, deterministic
    * content; bounded in practice — every (seed, r, bands) triple is
    * a code literal and d is the corpus's embedding width. ±1.0
    * doubles (not a bitmask+branch) so the hot loop below is a plain
    * multiply-add the JIT can vectorize.
    */
  private val rpSignCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Double]]()

  private def rpSigns(seed: Long, nBits: Int, d: Int): Array[Double] =
    rpSignCache.computeIfAbsent((seed, nBits, d), _ => {
      val s = new Array[Double](nBits * d)
      var t = 0
      while (t < nBits) {
        val base = seed * 0x9e3779b97f4a7c15L + t.toLong * 0x100000001b3L
        var j = 0
        while (j < d) {
          s(t * d + j) = if ((mix(base + j) & 1L) == 1L) 1.0 else -1.0
          j += 1
        }
        t += 1
      }
      s
    })

  def rpBands(vec: ArrayData, r: Int, bands: Int, seed: Long): ArrayData = {
    noNulls(vec, "graft_rpbands")
    val d = vec.numElements()
    val v = vec.toDoubleArray()
    val out = new Array[Long](bands)
    val nBits = r * bands
    val signs = rpSigns(seed, nBits, d)
    var t = 0
    var off = 0
    while (t < nBits) {
      var p = 0.0
      var j = 0
      while (j < d) { p += signs(off + j) * v(j); j += 1 }
      if (p > 0) out(t / r) |= (1L << (t % r))
      off += d
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Shared shingle builder for [[shingles]] / [[shinglesSorted]] —
    * one definition of the separator and window copy, so the fused
    * variant can never silently diverge from the plain one. */
  private def buildShingles(toks: ArrayData,
      n: Int): Array[org.apache.spark.unsafe.types.UTF8String] = {
    val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val cnt = toks.numElements()
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](
      math.max(0, cnt - n + 1))
    var i = 0
    while (i <= cnt - n) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    out
  }

  def shingles(toks: ArrayData, n: Int): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      buildShingles(toks, n).asInstanceOf[Array[Any]])

  /** ≡ array_sort(array_distinct(shingles(toks, n))) in ONE codegen'd
    * kernel pass: UTF8String.compareTo is the same binary order
    * array_sort uses for strings and compareTo == 0 is array_distinct's
    * binary equality, so the result is element-identical — but
    * array_sort/array_distinct are higher-order/collection expressions
    * that keep their whole Project out of whole-stage codegen and pay
    * an interpreted comparator call per comparison. The exact-Jaccard
    * family runs this on every document (the single heaviest stage of
    * llm_dedup_jaccard), so the fused form moves the entire shingle
    * stage into codegen.
    */
  def shinglesSorted(toks: ArrayData, n: Int): ArrayData = {
    val out = buildShingles(toks, n)
    val m = out.length
    java.util.Arrays.sort(out.asInstanceOf[Array[Object]], 0, m)
    var w = if (m > 0) 1 else 0
    var i = 1
    while (i < m) {
      if (out(i).compareTo(out(w - 1)) != 0) { out(w) = out(i); w += 1 }
      i += 1
    }
    val res = if (w == m) out else java.util.Arrays.copyOfRange(out, 0, w)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      res.asInstanceOf[Array[Any]])
  }

  /** Symmetric int8 quantization, one pass; see [[Quant8]]. */
  def quant8(e: ArrayData): InternalRow = {
    noNulls(e, "graft_quant8")
    val n = e.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(e.getDouble(i))
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    val scale = maxAbs / 127.0
    val q = new Array[Any](n)
    i = 0
    while (i < n) {
      q(i) = if (scale == 0.0) 0
        else math.floor(e.getDouble(i) / scale + 0.5).toInt
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(q)))
  }

  /** One pass over the (decoded-once) string; see [[CharNgrams]]. */
  def charNgrams(s: org.apache.spark.unsafe.types.UTF8String,
      n: Int): ArrayData = {
    val str = s.toString
    val len = str.length
    if (len < n) {
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    } else {
      val out = new Array[Any](len - n + 1)
      var i = 0
      while (i <= len - n) {
        out(i) = org.apache.spark.unsafe.types.UTF8String
          .fromString(str.substring(i, i + n))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  /** CJK scripts carry no whitespace word boundaries; everything
    * below U+1100 (Latin, Greek, Cyrillic, Arabic, …) short-circuits
    * before the script table lookup.
    */
  private def isCjkCp(cp: Int): Boolean = cp >= 0x1100 && {
    val sc = Character.UnicodeScript.of(cp)
    sc == Character.UnicodeScript.HAN ||
      sc == Character.UnicodeScript.HIRAGANA ||
      sc == Character.UnicodeScript.KATAKANA ||
      sc == Character.UnicodeScript.HANGUL
  }

  /** Kernel behind [[CjkTokens]] — see its Scaladoc for the exact
    * equivalence contract with the regex rendering.
    */
  def tokensCjk(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val str = s.toLowerCase.toString
    val len = str.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](16)
    val sb = new java.lang.StringBuilder
    def flush(): Unit = if (sb.length > 0) {
      out += org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      sb.setLength(0)
    }
    var i = 0
    while (i < len) {
      val c = str.charAt(i)
      // Java regex \s — the set the r13 tokenizer split on
      if (c == ' ' || c == '\t' || c == '\n' || c == 11.toChar ||
          c == '\f' || c == '\r') {
        flush()
        i += 1
      } else {
        val cp = str.codePointAt(i)
        val w = Character.charCount(cp)
        if (isCjkCp(cp)) {
          flush()
          out += org.apache.spark.unsafe.types.UTF8String
            .fromString(str.substring(i, i + w))
        } else sb.append(str, i, i + w)
        i += w
      }
    }
    flush()
    // split("", " ") and split-of-all-space both yield [""] — keep it
    if (out.isEmpty)
      out += org.apache.spark.unsafe.types.UTF8String.fromString("")
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Idempotent SQL registration of all graft kernels. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_tokens",
      exprs => CjkTokens(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_winnow_fps",
      exprs => WinnowFps(exprs(0), exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
        case other => throw new IllegalArgumentException(
          s"graft_winnow_fps k must be a literal integer, got $other")
      }, exprs(2) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
        case other => throw new IllegalArgumentException(
          s"graft_winnow_fps w must be a literal integer, got $other")
      }), "built-in")
    reg.createOrReplaceTempFunction("graft_window_hashes",
      exprs => WindowHashes(exprs(0), exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
        case other => throw new IllegalArgumentException(
          s"graft_window_hashes w must be a literal integer, got $other")
      }), "built-in")
    reg.createOrReplaceTempFunction("graft_char_ngrams",
      exprs => CharNgrams(exprs(0), exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
        case other => throw new IllegalArgumentException(
          s"graft_char_ngrams n must be a literal integer, got $other")
      }), "built-in")
    reg.createOrReplaceTempFunction("graft_quant8",
      exprs => Quant8(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_dot",
      exprs => DoubleArrayDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash64",
      exprs => SimHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash_text",
      exprs => SimHashText(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_shingles",
      exprs => ShingleArray(exprs(0), exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
        case other => throw new IllegalArgumentException(
          s"graft_shingles n must be a literal integer, got $other")
      }), "built-in")
    reg.createOrReplaceTempFunction("graft_shingles_sorted",
      exprs => ShingleArraySorted(exprs(0), exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
        case other => throw new IllegalArgumentException(
          s"graft_shingles_sorted n must be a literal integer, got $other")
      }), "built-in")
    def litInt(e: org.apache.spark.sql.catalyst.expressions.Expression,
        what: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
      case other => throw new IllegalArgumentException(
        s"graft_rpbands $what must be a literal integer, got $other")
    }
    // the seed is a genuine Long — funneling it through litInt would
    // silently truncate >32-bit seeds to the low word (ADVICE r2)
    def litLong(e: org.apache.spark.sql.catalyst.expressions.Expression,
        what: String): Long = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
      case other => throw new IllegalArgumentException(
        s"graft_rpbands $what must be a literal integer, got $other")
    }
    reg.createOrReplaceTempFunction("graft_rpbands",
      exprs => RandomProjBands(exprs(0), litInt(exprs(1), "r"),
        litInt(exprs(2), "bands"), litLong(exprs(3), "seed")), "built-in")
    reg.createOrReplaceTempFunction("graft_best_centroid",
      exprs => BestCentroid(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_best_centroid_l2",
      exprs => BestCentroidL2(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_cos_centroids",
      exprs => CosCentroids(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash",
      exprs => MinHashArray(exprs(0), exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
        case other => throw new IllegalArgumentException(
          s"graft_minhash k must be a literal integer, got $other")
      }), "built-in")
    SeededFnvHash.register(spark)
  }
}
