package graft

/** Driver-side reference semantics for the near-dup dedup family, shared by
  * the incremental-dedup suites: distinct word-3-shingle sets of the
  * lowercased text (whole text as one shingle under 3 words — the
  * hashedShingles contract), exact Jaccard, smaller-id-partner rule.
  */
object DedupReference {

  def shingles(t: String): Set[String] = {
    val w = t.toLowerCase.split(" ", -1)
    if (w.length < 3) Set(w.mkString(" ")) else w.sliding(3).map(_.mkString(" ")).toSet
  }

  /** A doc survives iff it has no ≥threshold-Jaccard partner with a smaller
    * doc_id anywhere in the corpus.
    */
  def survivors(docs: Seq[(Long, String)], threshold: Double): Set[Long] = {
    val sh = docs.map { case (id, t) => id -> shingles(t) }.toMap
    docs.map(_._1).filter { b =>
      !docs.map(_._1).exists { a =>
        a < b && {
          val (sa, sb) = (sh(a), sh(b))
          val inter = (sa & sb).size.toDouble
          inter / (sa.size + sb.size - inter) >= threshold
        }
      }
    }.toSet
  }

  /** Corpus-wide verified pair set (doc_a < doc_b, Jaccard ≥ threshold). */
  def pairs(docs: Seq[(Long, String)], threshold: Double): Set[(Long, Long)] = {
    val sh = docs.map { case (id, t) => id -> shingles(t) }.toMap
    val ids = docs.map(_._1)
    (for {
      a <- ids; b <- ids if a < b
      (sa, sb) = (sh(a), sh(b))
      inter = (sa & sb).size.toDouble
      if inter / (sa.size + sb.size - inter) >= threshold
    } yield (a, b)).toSet
  }
}
