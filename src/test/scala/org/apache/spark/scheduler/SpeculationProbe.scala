package org.apache.spark.scheduler

import org.apache.spark.SparkContext

/** Test shim: local mode deliberately never starts the speculation poll
  * thread (`TaskSchedulerImpl.start` guards the timer on `!isLocal`), so a
  * local-mode spec must drive the identical check the timer would run.
  * Lives in org.apache.spark.scheduler only to cross the private[spark]
  * accessor on `SparkContext.taskScheduler`; it calls the public
  * `checkSpeculatableTasks()` — no private logic is reimplemented. */
object SpeculationProbe {
  def check(sc: SparkContext): Unit =
    sc.taskScheduler.asInstanceOf[TaskSchedulerImpl].checkSpeculatableTasks()
}
