package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sinks.Sinks

/** Output file sizing probe for the compaction sink (guide §6, r19
  * "not yet optimized" #4): `Sinks.compactPartitions`' sizing knob is
  * `maxRecordsPerFile`; this probe shows, at a generated scale, what
  * file count/size distribution a fragmented table has BEFORE
  * compaction and what each `maxRecordsPerFile` setting produces AFTER,
  * so the knob can be sized to the guide's 128 MB–1 GB output band
  * from measured bytes-per-row instead of guessed.
  *
  * Method: write the `ext_compact` query's fragmented table shape
  * (orders, even keys, 8 writer tasks per status partition), then for
  * each target setting compact a fresh copy and record files, bytes,
  * min/max/avg file size per partition, wall seconds, and a rows
  * checksum proving the swap lost nothing.
  *
  * args: sfDir [maxRecordsPerFile ...]  (default 1000000 4000000)
  */
object CompactSizingProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val targets: Seq[Long] =
      if (args.length > 1) args.drop(1).toSeq.map(_.toLong)
      else Seq(1000000L, 4000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val orders = spark.read.parquet(s"$dir/orders.parquet")

    def fileStats(path: String): (Long, Long, Long, Long) = {
      val base = java.nio.file.Paths.get(path)
      val files = java.nio.file.Files.walk(base).iterator()
      var n = 0L; var total = 0L; var mn = Long.MaxValue; var mx = 0L
      files.forEachRemaining { p =>
        val name = p.getFileName.toString
        if (name.endsWith(".parquet") && !name.startsWith("_")) {
          val sz = java.nio.file.Files.size(p)
          n += 1; total += sz
          if (sz < mn) mn = sz
          if (sz > mx) mx = sz
        }
      }
      (n, total, if (n == 0) 0L else mn, mx)
    }
    def rowsChk(path: String): String = {
      val r = spark.read.parquet(path)
        .agg(count(lit(1)), sum(pmod(xxhash64(col("o_orderkey"),
          col("o_totalprice")), lit(1000000007L)))).head()
      s"${r.getLong(0)}/${if (r.isNullAt(1)) 0L else r.getLong(1)}"
    }

    val runs = targets.map { target =>
      val table = java.nio.file.Files
        .createTempDirectory("graft_compact_probe").toString + "/t"
      spark.sparkContext.setJobDescription(
        s"compact probe: fragment (target=$target)")
      orders.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .repartition(8)
        .write.partitionBy("o_orderstatus").parquet(table)
      val (fn0, fb0, fmin0, fmax0) = fileStats(table)
      val chkBefore = rowsChk(table)
      spark.sparkContext.setJobDescription(
        s"compact probe: compact (target=$target)")
      val t0 = System.nanoTime()
      Sinks.compactPartitions(spark, table, "o_orderstatus",
        maxRecordsPerFile = target, parallelism = 2)
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      val (fn1, fb1, fmin1, fmax1) = fileStats(table)
      val chkAfter = rowsChk(table)
      s"""{"max_records_per_file":$target,""" +
        s""""before":{"files":$fn0,"bytes":$fb0,"min_b":$fmin0,"max_b":$fmax0},""" +
        s""""after":{"files":$fn1,"bytes":$fb1,"min_b":$fmin1,"max_b":$fmax1},""" +
        s""""compact_sec":$sec,"chk_before":"$chkBefore",""" +
        s""""chk_after":"$chkAfter","chk_equal":${chkBefore == chkAfter}}"""
    }
    val nRows = orders.filter(col("o_orderkey") % 2 === 0).count()
    println(
      s"""{"probe":"compact_sizing","dir":"$dir","n_rows":$nRows,""" +
        s""""runs":[${runs.mkString(",")}]}""")
    spark.stop()
  }
}
