package graft.operators

import org.apache.spark.sql.DataFrame

/** THE scaffold for driver-driven DataFrame fixpoints (connected
  * components, PageRank, BFS, k-core peeling, BPE's merge loop). Every
  * iterative operator previously hand-rolled the same three obligations;
  * centralizing them means a drift in any one of them (a forgotten
  * localCheckpoint quietly growing lineage 2^rounds, a missing backstop
  * spinning on a non-converging input, a collect sneaking into a probe)
  * is now a single-site review, not a five-site audit.
  *
  * Contract:
  *   - every state (the seed and each step's output) is
  *     `localCheckpoint()`ed HERE — per-round lineage stays O(1), and
  *     `step` sends and receives plain, already-materialized frames;
  *   - `progress(prev, next)` must be COUNT-shaped — its value is only
  *     compared to 0 (rounds continue while > 0); never a collect;
  *   - `maxRounds` is a BACKSTOP, not a schedule: algorithms converge by
  *     the probe, and hitting the cap returns the current state (callers
  *     whose oracles unroll a fixed stage depth pass that same depth).
  */
private[operators] object Iterate {

  /** Converged (or capped) state plus the number of `step` rounds
    * actually executed — the spec hook for round-complexity claims
    * (star-contraction logarithmic rounds, convergence-stopped ranks). */
  final case class Fixpoint(state: DataFrame, rounds: Int)

  /** Drive `state0` through `step(state, roundIndex)` (0-based index)
    * until `progress(prev, next) == 0` or `maxRounds` executed. */
  def fixpoint(state0: DataFrame, maxRounds: Int)(
      step: (DataFrame, Int) => DataFrame)(
      progress: (DataFrame, DataFrame) => Long): Fixpoint = {
    var state = state0.localCheckpoint()
    var rounds = 0
    var more = true
    while (more && rounds < maxRounds) {
      val next = step(state, rounds).localCheckpoint()
      rounds += 1
      more = progress(state, next) > 0
      state = next
    }
    Fixpoint(state, rounds)
  }
}
