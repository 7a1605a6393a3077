package graft

import graft.operators.CurrentState
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** B1/B3 storage lifecycle: the physical TTL (partition drop) over the
  * day-partitioned MergeTree-style layout.
  */
class StorageLifecycleSpec extends SparkSpecBase {

  test("dropExpiredDayPartitions removes only expired day= dirs, keeps the rest intact") {
    val out = s"${sys.props("java.io.tmpdir")}/graft_ttl_spec"
    val e = Tables.events(spark, sf).select("event_id", "user_id", "value", "ts")
    CurrentState.writePartitionedByDay(e, "ts", "user_id", out)

    val days = spark.read.parquet(out)
      .select(col("day").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(days.length >= 3, s"need ≥3 day partitions to test, got ${days.toSeq}")
    val cutoff = days(days.length / 2)
    val expectedKeptRows = CurrentState.withDayPartition(e, "ts")
      .filter(col("day") >= cutoff).count()

    val dropped = CurrentState.dropExpiredDayPartitions(spark, out, cutoff)
    assert(dropped == days.filter(_ < cutoff).toSeq, s"dropped=$dropped")

    val back = spark.read.parquet(out)
    val backDays = back.select(col("day").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(backDays.toSeq == days.filter(_ >= cutoff).toSeq)
    assert(back.count() == expectedKeptRows) // kept data untouched

    // idempotent: nothing left to drop at the same cutoff
    assert(CurrentState.dropExpiredDayPartitions(spark, out, cutoff).isEmpty)
  }

  test("dropExpiredDayPartitions on a missing path is a no-op") {
    assert(CurrentState.dropExpiredDayPartitions(spark,
      s"${sys.props("java.io.tmpdir")}/graft_ttl_nonexistent", "20240101").isEmpty)
  }

  test("mergeIntoDayLayout upserts corrections and late data, rewriting only touched days") {
    val out = s"${sys.props("java.io.tmpdir")}/graft_merge_spec"
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)

    val base = Tables.events(spark, sf).select("event_id", "user_id", "value", "ts")
    CurrentState.writePartitionedByDay(base, "ts", "user_id", out)
    val baseCount = spark.read.parquet(out).count()

    // corrections: 5 existing events re-delivered with a newer ts and
    // a marker value; late data: 3 brand-new events in a new day
    val corrections = base.orderBy("event_id").limit(5)
      .withColumn("value", lit(99999.0))
      .withColumn("ts", col("ts") + expr("INTERVAL 1 MINUTE"))
    val late = base.orderBy(col("event_id").desc).limit(3)
      .withColumn("event_id", col("event_id") + 10000000L)
      .withColumn("ts", col("ts") + expr("INTERVAL 60 DAYS"))
    val updates = corrections.unionByName(late)

    val touched = CurrentState.mergeIntoDayLayout(spark, out, updates,
      "ts", Seq("event_id"), "ts", "event_id")
    val expectedDays = CurrentState.withDayPartition(updates, "ts")
      .select("day").distinct().collect().map(_.getString(0)).sorted.toSeq
    assert(touched == expectedDays)

    val after = spark.read.parquet(out)
    assert(after.count() == baseCount + 3) // corrections replace, late rows add
    // every corrected event now carries the marker value exactly once
    val corrected = after.filter(col("value") === 99999.0).count()
    assert(corrected == 5, s"corrected=$corrected")
    val correctedIds = corrections.select("event_id").collect().map(_.getLong(0)).toSet
    assert(after.filter(col("event_id").isin(correctedIds.toSeq: _*)).count() == 5)

    // merge is idempotent: re-applying the same updates changes nothing
    CurrentState.mergeIntoDayLayout(spark, out, updates,
      "ts", Seq("event_id"), "ts", "event_id")
    assert(spark.read.parquet(out).count() == baseCount + 3)
  }

  test("mergeIntoDayLayout recovers from stale staging/backup dirs of a crashed run") {
    val out = s"${sys.props("java.io.tmpdir")}/graft_merge_stale_spec"
    val root = new org.apache.hadoop.fs.Path(out)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(root, true)

    val base = Tables.events(spark, sf).select("event_id", "user_id", "value", "ts")
    CurrentState.writePartitionedByDay(base, "ts", "user_id", out)
    val baseCount = spark.read.parquet(out).count()

    val updates = base.orderBy("event_id").limit(2)
      .withColumn("value", lit(77777.0))
      .withColumn("ts", col("ts") + expr("INTERVAL 1 MINUTE"))
    val day = CurrentState.withDayPartition(updates, "ts")
      .select("day").distinct().collect().map(_.getString(0)).head

    // leftovers of a crashed prior run: on RawLocalFS a rename onto an
    // existing dir nests the source inside it, silently corrupting the
    // swap if not cleared first
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, s".merge_day=$day/junk"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, s".old_day=$day/junk"))

    CurrentState.mergeIntoDayLayout(spark, out, updates,
      "ts", Seq("event_id"), "ts", "event_id")
    val after = spark.read.parquet(out)
    assert(after.count() == baseCount)
    assert(after.filter(col("value") === 77777.0).count() == 2)
    // no staging/backup debris left behind
    val debris = fs.listStatus(root).map(_.getPath.getName)
      .filter(n => n.startsWith(".merge_day=") || n.startsWith(".old_day="))
    assert(debris.isEmpty, s"debris=${debris.toSeq}")
  }

  test("compactDayPartitions merges small files per day, preserving data and clustering") {
    val out = s"${sys.props("java.io.tmpdir")}/graft_compact_spec"
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)

    // Simulate a streaming sink: three appends × several tasks → many
    // small files per day partition.
    val e = CurrentState.withDayPartition(
      Tables.events(spark, sf).select("event_id", "user_id", "value", "ts"), "ts")
    (1 to 3).foreach { _ =>
      e.repartition(4).write.mode("append").partitionBy("day").parquet(out)
    }
    def filesPerDay(): Map[String, Int] =
      fs.listStatus(new org.apache.hadoop.fs.Path(out)).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("day="))
        .map(d => d.getPath.getName ->
          fs.listStatus(d.getPath).count(f => f.getPath.getName.endsWith(".parquet")))
        .toMap
    assert(filesPerDay().values.forall(_ >= 3), "setup should create many files")
    val before = spark.read.parquet(out)
      .orderBy("event_id").collect().map(_.toSeq)

    val compacted = CurrentState.compactDayPartitions(spark, out, "user_id", "ts")
    assert(compacted.nonEmpty)
    assert(filesPerDay().values.forall(_ == 1), s"still fragmented: ${filesPerDay()}")
    val after = spark.read.parquet(out)
      .orderBy("event_id").collect().map(_.toSeq)
    assert(after.sameElements(before)) // merge rewrites, never loses

    // idempotent: already at the target file count
    assert(CurrentState.compactDayPartitions(spark, out, "user_id", "ts").isEmpty)
  }

  test("day filter on the partitioned layout prunes partitions at the scan") {
    // THE 100 TB lever: a one-day query against a year of history
    // must read one day's files, not filter a full scan. Pinned on
    // the executed plan's PartitionFilters AND on the actual file
    // set handed to the scan.
    val out = s"${sys.props("java.io.tmpdir")}/graft_prune_spec"
    val e = Tables.events(spark, sf).select("event_id", "user_id", "value", "ts")
    CurrentState.writePartitionedByDay(e, "ts", "user_id", out)
    val all = spark.read.parquet(out)
    val days = all.select(col("day").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(days.length > 1)

    val oneDay = all.filter(col("day") === days.head)
    val qe = oneDay.queryExecution
    qe.executedPlan.execute().count()
    val plan = qe.executedPlan.toString.replace("\n", " ")
    assert("PartitionFilters: \\[[^\\]]*day".r.findFirstIn(plan).isDefined,
      plan.take(600))
    // only the selected day's files reach the scan (NOT inputFiles,
    // which lists the relation's full index regardless of pruning)
    val scan = qe.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val numFiles = scan.metrics("numFiles").value
    assert(numFiles > 0)
    assert(numFiles < all.inputFiles.length,
      s"scan read $numFiles of ${all.inputFiles.length} files — no pruning")
  }
}
