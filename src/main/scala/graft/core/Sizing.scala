package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Data-derived shuffle-partition sizing — the deploy-time knob, computed
  * from the data instead of remembered by an operator.
  *
  * The round-8 sf10 probes established the failure mode: a FIXED
  * `spark.sql.shuffle.partitions` (32, right for the gated scales) puts 10×
  * the intended volume in each sort/join partition at the next decade and
  * spills (m7 36.7 → 5.8 s and d11 442 → 213 s at 256 partitions, same
  * outputs). A real cluster sizes partitions to the data; this derives the
  * same answer from the input footprint:
  *
  *   partitions = clamp(inputBytes × expansion / targetBytesPerPartition,
  *                      cpus, cap)
  *
  * with expansion 10× (snappy parquet decodes to roughly an order of
  * magnitude more row bytes — measured on the testdata tables) and the
  * per-partition target 64 MiB, matching AQE's advisory size. The number
  * only needs to be RIGHT-SIZED FOR THE BIGGEST shuffle: AQE coalescing
  * (enabled in every session here) merges small post-shuffle partitions
  * back to the advisory size at runtime from MEASURED map output, so the
  * cost of a generous initial number at small scale is scheduling overhead
  * AQE removes. Validated at sf10: the derived count (~224 for the 1.5 GB
  * directory) reproduces the measured 256-partition A/B envelope on m7/d11
  * with no env knob set.
  */
object Sizing {

  /** Decoded-row expansion over snappy parquet bytes (order of magnitude). */
  val Expansion = 10L

  /** Per-partition in-flight target — AQE's advisory partition size. */
  val TargetBytes: Long = 64L << 20

  /** Total on-disk footprint of a scale directory (any Hadoop filesystem —
    * the same call works on HDFS/S3A paths on a real cluster). 0 when the
    * path is missing or unreadable: the caller then falls back to `cpus`. */
  def inputBytes(dir: String): Long =
    try {
      val p = new Path(dir)
      val fs = p.getFileSystem(new Configuration())
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    } catch { case _: Throwable => 0L }

  /** Shuffle-partition count for a job over `dir`: at least `cpus` (full
    * thread utilization at gated scales), at most `cap` (per-partition
    * scheduling overhead dominates beyond ~1k on one box; a multi-node
    * deployment raises it with executor count). */
  def shufflePartitions(dir: String, cpus: Int, cap: Int = 1024): Int = {
    val derived = (inputBytes(dir) * Expansion / TargetBytes).toInt
    math.min(cap, math.max(cpus, derived))
  }
}
