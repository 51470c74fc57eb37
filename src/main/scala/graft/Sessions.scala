package graft
import org.apache.spark.sql.SparkSession

/** Shared SparkSession defaults for the engine mains.
  *
  * `coalescePartitions.minPartitionSize` is lowered from the 1 MB
  * default because several operators (all-pairs similarity, shingle
  * explodes) have tiny shuffle inputs that fan out to heavy CPU work —
  * AQE would coalesce them to a handful of partitions and serialize
  * the expensive stage. At real scale inputs are large and this
  * setting is inert.
  *
  * `files.maxPartitionBytes` is lowered from 128 MB for the same
  * reason on the SCAN side: the whole bench lineitem table is a
  * single ~11 MB parquet file, which at the default split size scans
  * as ONE task — every whole-table aggregation would run
  * single-threaded. Unlike the AQE knob above this one is NOT inert
  * at scale (it would shred a multi-GB file into 1 MB tasks and
  * multiply scheduler overhead ~128×): it is a harness-local override
  * for this factory, which only the local mains/tests call — a
  * cluster deployment configures its own session and keeps the
  * 128 MB default.
  */
object Sessions {
  def local(cpus: String): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
    .config("spark.sql.files.maxPartitionBytes", "1m")
    .config("spark.sql.files.openCostInBytes", "64k")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .getOrCreate()
}
