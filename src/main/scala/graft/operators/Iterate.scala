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

  /** Drop the checkpoint blocks backing a SUPERSEDED fixpoint state
    * (non-blocking). Every round's `localCheckpoint()` pins its blocks in
    * the BlockManager until the RDD object is GC'd and the ContextCleaner
    * notices — on a large driver heap that is effectively never, so a
    * fixpoint's storage footprint grew O(rounds) (and a long session
    * accumulated every finished query's dead rounds on top). Freeing the
    * previous state the moment the next one is materialized keeps live
    * checkpoint storage O(1) per fixpoint — at 100 TB the difference
    * between one round's state resident and the whole history. Only ever
    * called on states this scaffold created and no caller can still see:
    * the seed and intermediate rounds, never the returned final state. */
  private def dropCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false)
      case _ => ()
    }

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
      dropCheckpoint(state) // superseded: next is materialized, probe done
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
    raiseIfCapped(fp, maxRounds)
    fp
  }

  private def raiseIfCapped(fp: Fixpoint, maxRounds: Int): Unit =
    if (!fp.converged)
      throw new IllegalStateException(
        s"fixpoint still progressing after $maxRounds rounds — raise the " +
          "backstop or inspect the input (returning the capped state " +
          "would be silently wrong)")

  private val obsId = new java.util.concurrent.atomic.AtomicLong()

  /** [[fixpointConverged]] with the progress probe FOLDED INTO the
    * checkpoint materialization: `metric` is a count-shaped AGGREGATE
    * column evaluated over each round's OUTPUT rows during the eager
    * `localCheckpoint()` job itself (Spark's Observation/CollectMetrics
    * machinery — the metric rides the plan, every row is observed
    * exactly once by the materializing action, and the value is
    * available the moment the checkpoint returns). A round therefore
    * pays exactly ONE job; the two-argument probe shape pays a second
    * launch-a-job-and-rescan-the-checkpoint pass per round. Fits any
    * fixpoint whose progress is a function of the new state alone
    * (peeling's "nodes that just died"); probes comparing prev vs next
    * stay on [[fixpointConverged]]. */
  def fixpointObservedConverged(state0: DataFrame, maxRounds: Int)(
      step: (DataFrame, Int) => DataFrame)(
      metric: org.apache.spark.sql.Column): Fixpoint = {
    val fp = fixpointObserved(state0, maxRounds)(step)(metric)
    raiseIfCapped(fp, maxRounds)
    fp
  }

  /** [[fixpointObservedConverged]] WITHOUT the cap tripwire — for loops
    * whose round cap is part of the operator's semantics (a bounded
    * depth, a fixed budget) rather than a convergence backstop, but
    * whose progress probe is still a pure aggregate of the new state
    * (so it rides the checkpoint job: one job per round where the
    * two-argument [[fixpoint]] probe pays a second scan). */
  def fixpointObserved(state0: DataFrame, maxRounds: Int)(
      step: (DataFrame, Int) => DataFrame)(
      metric: org.apache.spark.sql.Column): Fixpoint = {
    var state = state0.localCheckpoint()
    var rounds = 0
    var more = true
    while (more && rounds < maxRounds) {
      val obs = org.apache.spark.sql.Observation(
        s"graft_fixpoint_${obsId.incrementAndGet()}")
      val next = step(state, rounds)
        .observe(obs, metric.as("progress"))
        .localCheckpoint()
      rounds += 1
      // the eager checkpoint above IS the observed action, so the metric
      // is already delivered — this does not block
      more = Option(obs.get("progress"))
        .map(_.asInstanceOf[Number].longValue).getOrElse(0L) > 0
      dropCheckpoint(state) // superseded: next is materialized
      state = next
    }
    Fixpoint(state, rounds, converged = !more)
  }

  /** [[fixpointObservedConverged]] for STATE-SUMMARY probes: callers
    * whose convergence test compares an aggregate of the new state
    * against the same aggregate of the previous state (sssp's
    * (count, Σdist), CC's label sum). `metrics` ride each checkpoint
    * materialization — including the SEED's, replacing the memoize-the-
    * previous-round trick — so a round still pays exactly one job;
    * `same(prev, next)` sees the two observed value sequences (metric
    * order preserved) and may throw to surface probe-integrity
    * violations (e.g. a decimal overflow turning a sum NULL). */
  def fixpointObservedConvergedBy(state0: DataFrame, maxRounds: Int)(
      step: (DataFrame, Int) => DataFrame)(
      metrics: Seq[org.apache.spark.sql.Column])(
      same: (Seq[Any], Seq[Any]) => Boolean): Fixpoint = {
    val fp = fixpointObservedBy(state0, maxRounds)(step)(metrics)(same)
    raiseIfCapped(fp, maxRounds)
    fp
  }

  /** [[fixpointObservedConvergedBy]] WITHOUT the cap tripwire — the
    * state-summary-probe twin of [[fixpointObserved]], for semantically
    * capped loops (e.g. a depth-bounded BFS, where stopping at the cap
    * while still expanding is the operator's defined output). */
  def fixpointObservedBy(state0: DataFrame, maxRounds: Int)(
      step: (DataFrame, Int) => DataFrame)(
      metrics: Seq[org.apache.spark.sql.Column])(
      same: (Seq[Any], Seq[Any]) => Boolean): Fixpoint = {
    val named = metrics.zipWithIndex.map { case (m, i) => m.as(s"m$i") }
    def observed(df: DataFrame): (DataFrame, Seq[Any]) = {
      val obs = org.apache.spark.sql.Observation(
        s"graft_fixpoint_${obsId.incrementAndGet()}")
      val ckpt = df.observe(obs, named.head, named.tail: _*).localCheckpoint()
      // the eager checkpoint is the observed action — get does not block
      val m = obs.get
      (ckpt, named.indices.map(i => m(s"m$i")))
    }
    var (state, prevVals) = observed(state0)
    var rounds = 0
    var more = true
    while (more && rounds < maxRounds) {
      val (next, nextVals) = observed(step(state, rounds))
      rounds += 1
      more = !same(prevVals, nextVals)
      prevVals = nextVals
      dropCheckpoint(state) // superseded: next is materialized
      state = next
    }
    Fixpoint(state, rounds, converged = !more)
  }
}
