package graft.sim

/** Test-only access to sim-private helpers (round-replica parity pins). */
object SimilarityTestHook {
  def round6(d: Double): Double = Similarity.round6(d)
}
