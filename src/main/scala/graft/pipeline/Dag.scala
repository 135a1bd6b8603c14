package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Topologically-ordered job runner with per-job failure isolation
  * (SURVEY.md §3 EP1/EP2, §7.1 `pipeline/Dag.scala`).
  *
  * The reference sequences ~25 fetch→transform→upload stages, each wrapped in
  * try/except so one failure doesn't halt the day's run
  * (`/root/reference/run_daily_pipeline.py:49-55`). Here the same contract is
  * explicit: jobs declare dependencies, run in topological order, a failed
  * job is recorded and its transitive dependents are SKIPPED (running them on
  * missing/stale inputs — the reference's actual behavior — is the one
  * deviation we do not reproduce), and everything independent still runs.
  */
/** @param heavy declared MEMORY class, not a speed hint: `true` marks a job
  *   whose plan materializes candidate-PAIR-scale shuffle state (simhash /
  *   minhash band joins, embedding ring joins — state ~O(candidate pairs),
  *   not O(rows)). [[Dag.runParallel]] admits at most `heavyCap` (default 1)
  *   heavy jobs per wave: two pair builds co-resident in one 32-thread JVM
  *   OOM'd the sf10 run (round 10, measured), and the fix must not depend on
  *   a fortuitous lineage dep existing between whichever two heavy jobs land
  *   in the same wave next. Light jobs co-schedule freely. */
final case class Job(name: String, deps: Seq[String], run: SparkSession => Unit,
    heavy: Boolean = false)

final case class JobResult(name: String, status: String, // ok | failed | skipped
    error: Option[String], durationMs: Long)

final class Dag(jobs: Seq[Job]) {
  require(jobs.map(_.name).distinct.size == jobs.size, "duplicate job names")
  private val byName = jobs.map(j => j.name -> j).toMap
  jobs.foreach(j => j.deps.foreach(d =>
    require(byName.contains(d), s"job ${j.name} depends on unknown job $d")))

  /** Kahn topological order; deterministic (insertion order among ready jobs). */
  private def topoOrder: Seq[Job] = {
    val order = scala.collection.mutable.ArrayBuffer.empty[Job]
    val done = scala.collection.mutable.Set.empty[String]
    var remaining = jobs
    while (remaining.nonEmpty) {
      val (ready, blocked) = remaining.partition(_.deps.forall(done.contains))
      require(ready.nonEmpty, s"dependency cycle among: ${remaining.map(_.name).mkString(",")}")
      ready.foreach { j => order += j; done += j.name }
      remaining = blocked
    }
    order.toSeq
  }

  /** Wave-parallel run: every dependency-ready job of a wave executes
    * concurrently on a bounded pool (concurrent actions on one SparkSession
    * are safe and keep the cluster busy while another job's stage tail
    * finishes). Same failure isolation as [[run]]: a failed job poisons its
    * transitive dependents, everything else proceeds.
    *
    * Memory-aware admission: at most `heavyCap` [[Job.heavy]] jobs are
    * admitted per wave — the rest stay in the ready queue for a later wave
    * (their deps are already satisfied, so they are first in line). This
    * bounds peak executor memory to one pair-machinery working set plus the
    * light jobs' mart-sized state, whatever shape the DAG grows into. */
  def runParallel(spark: SparkSession, parallelism: Int = 4,
      heavyCap: Int = 1): Seq[JobResult] = {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = Executors.newFixedThreadPool(math.max(1, parallelism))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val results = scala.collection.mutable.LinkedHashMap.empty[String, JobResult]
    val failed = scala.collection.mutable.Set.empty[String]
    var remaining = topoOrder
    try {
      while (remaining.nonEmpty) {
        val done = results.keySet.toSet
        val (ready, blocked) = remaining.partition(_.deps.forall(done.contains))
        // memory-class admission: skipped-to-be jobs (poisoned upstream)
        // consume no memory, so they never count against the heavy cap
        val (heavyReady, rest) =
          ready.partition(j => j.heavy && !j.deps.exists(failed.contains))
        val admitted = rest ++ heavyReady.take(math.max(1, heavyCap))
        val deferred = heavyReady.drop(math.max(1, heavyCap))
        val wave = admitted.map { job =>
          if (job.deps.exists(failed.contains)) {
            failed += job.name
            job.name -> Future.successful(JobResult(job.name, "skipped",
              Some(s"upstream failed: ${job.deps.filter(failed.contains).mkString(",")}"), 0L))
          } else job.name -> Future {
            val t0 = System.nanoTime()
            try {
              job.run(spark)
              JobResult(job.name, "ok", None, (System.nanoTime() - t0) / 1000000L)
            } catch {
              case e: Throwable => JobResult(job.name, "failed",
                Some(e.toString.take(500)), (System.nanoTime() - t0) / 1000000L)
            }
          }
        }
        wave.foreach { case (name, fut) =>
          val r = Await.result(fut, Duration.Inf)
          if (r.status == "failed") failed += name
          results += name -> r
        }
        remaining = deferred ++ blocked
      }
    } finally pool.shutdown()
    results.values.toSeq
  }

  def run(spark: SparkSession): Seq[JobResult] = {
    val failed = scala.collection.mutable.Set.empty[String]
    topoOrder.map { job =>
      val t0 = System.nanoTime()
      if (job.deps.exists(failed.contains)) {
        failed += job.name // transitively poison dependents
        JobResult(job.name, "skipped",
          Some(s"upstream failed: ${job.deps.filter(failed.contains).mkString(",")}"), 0L)
      } else {
        try {
          job.run(spark)
          JobResult(job.name, "ok", None, (System.nanoTime() - t0) / 1000000L)
        } catch {
          case e: Throwable =>
            failed += job.name
            JobResult(job.name, "failed", Some(e.toString.take(500)),
              (System.nanoTime() - t0) / 1000000L)
        }
      }
    }
  }
}
