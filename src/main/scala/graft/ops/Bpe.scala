package graft.ops

/** Byte-pair-encoding subword tokenization — the real segmentation an
  * LLM data pipeline runs, not the regex approximation
  * (`llm_token_count` keeps that as the cheap profiler).
  *
  * Public algorithm: Sennrich/Haddow/Birch, "Neural Machine
  * Translation of Rare Words with Subword Units" (ACL 2016) — learn
  * merges by repeatedly fusing the most frequent adjacent symbol
  * pair over a weighted word vocabulary; encode by replaying merges
  * greedily lowest-rank-first (the shape of GPT-2's public bpe.py
  * apply loop).
  *
  * Everything here is DETERMINISTIC by construction — pair selection
  * breaks frequency ties lexicographically (no hash-iteration-order
  * dependence), apply scans left-to-right — so the same corpus always
  * yields the same merge table and the same segmentation, which is
  * what makes the op reproducible across runs and what LlmSpec pins.
  *
  * 100 TB shape (mirrors the PQ codebook discipline,
  * [[graft.ops.PqOps]]): training consumes a BOUNDED word-count
  * sample (top-V by count — driver metadata of V·avg-word-len chars,
  * not corpus rows); the merge table is O(nMerges) broadcast-sized
  * plan metadata; encoding runs at VOCABULARY grain (each distinct
  * word encoded once cluster-wide), and documents pick up their
  * subword counts through a word-keyed equi-join — corpus text never
  * flows through the trainer and no per-document python/lambda loop
  * exists.
  */
object Bpe {

  /** Learn up to `nMerges` merges from (word, weight) counts.
    * Deterministic: the best pair maximizes weight, ties broken by
    * lexicographically smallest (left, right). Stops early when no
    * adjacent pair remains (every word fully merged). */
  def trainMerges(wordCounts: Seq[(String, Long)],
      nMerges: Int): Seq[(String, String)] = {
    var words = wordCounts.map { case (w, c) =>
      (w.map(_.toString).toArray, c)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < nMerges && !done) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words) {
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pc(k) = pc.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (pc.isEmpty) done = true
      else {
        val best = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => (applyMerge(syms, best), c) }
      }
    }
    merges.toSeq
  }

  /** One left-to-right pass fusing every non-overlapping occurrence
    * of the pair. */
  def applyMerge(syms: Array[String], m: (String, String)): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += (m._1 + m._2)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Encode one word: repeatedly apply the LOWEST-RANK adjacent pair
    * present (rank = training order) until none applies. Concatenating
    * the result always reproduces the word — merges only ever fuse
    * adjacent symbols (the round-trip LlmSpec pins). */
  def encode(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = word.map(_.toString).toArray
    var go = syms.length > 1
    while (go) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestI = i }
        i += 1
      }
      if (bestI < 0) go = false
      else {
        syms = applyMerge(syms, (syms(bestI), syms(bestI + 1)))
        if (syms.length < 2) go = false
      }
    }
    syms
  }
}
