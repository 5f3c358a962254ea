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
  *   - `maxRounds` is a BACKSTOP for schedule-shaped callers (a fixed
  *     merge-round budget) and a tripwire for convergence-shaped ones:
  *     correctness-bearing fixpoints (CC labels deciding what gets
  *     DROPPED, ranks, peeling) must go through [[fixpointConverged]],
  *     which RAISES when the cap cuts the loop mid-flight — silently
  *     returning half-propagated labels would split components and
  *     mis-dedup without any symptom.
  */
private[operators] object Iterate {

  /** Converged (or capped) state plus the number of `step` rounds
    * actually executed — the spec hook for round-complexity claims
    * (star-contraction logarithmic rounds, convergence-stopped ranks).
    * `converged` is false iff the cap fired while progress was still
    * being made. */
  final case class Fixpoint(state: DataFrame, rounds: Int, converged: Boolean)

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
    Fixpoint(state, rounds, converged = !more)
  }

  /** [[fixpoint]] for convergence-shaped callers: raises if the round
    * cap fired before the probe reached 0, instead of handing back a
    * state the algorithm itself says is not final. */
  def fixpointConverged(state0: DataFrame, maxRounds: Int)(
      step: (DataFrame, Int) => DataFrame)(
      progress: (DataFrame, DataFrame) => Long): Fixpoint = {
    val fp = fixpoint(state0, maxRounds)(step)(progress)
    if (!fp.converged)
      throw new IllegalStateException(
        s"fixpoint still progressing after $maxRounds rounds — raise the " +
          "backstop or inspect the input (returning the capped state " +
          "would be silently wrong)")
    fp
  }
}
