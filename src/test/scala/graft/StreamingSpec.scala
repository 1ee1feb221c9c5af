package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Structured Streaming wrappers driven through MemoryStream → memory sink:
  * the same event-time logic as the batch tier, executed incrementally. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("tumbling window counts accumulate per event-time hour") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val q = Streams.tumblingCounts(in.toDF.toDF("ts", "event_type"))
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("complete").start()
    try {
      in.addData((ts(1), "view"), (ts(20), "view"), (ts(70), "click"))
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .select(col("event_type"), col("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows == Map("view" -> 2L, "click" -> 1L))
    } finally q.stop()
  }

  test("streaming tumbling twin equals the batch operator on the real fixture") {
    implicit val sqlCtx = spark.sqlContext
    // the ENTIRE sf0.001 event fixture through MemoryStream in three
    // micro-batches must aggregate to exactly what the declared batch
    // operator computes in one shot — the twin-consistency guarantee the
    // streaming tier advertises
    val d = sfDir("sf0.001")
    val ev = graft.Tables.events(spark, d)
      .select(col("ts"), col("event_type"))
      .as[(Timestamp, String)].collect()
    val in = MemoryStream[(Timestamp, String)]
    val q = Streams.tumblingCounts(in.toDF.toDF("ts", "event_type"))
      .writeStream.format("memory").queryName("twin_tumbling")
      .outputMode("complete").start()
    try {
      ev.grouped(math.max(1, ev.length / 3)).foreach { chunk =>
        in.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("twin_tumbling")
        .select(unix_micros(col("start")).as("start_us"), col("event_type"), col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = operators.EventTime.qWinTumbling(spark, d)
        .select(col("start_us"), col("event_type"), col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch,
        s"streaming/batch diverge on ${streamed.size} vs ${batch.size} windows")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark removes repeated event_ids") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val q = Streams.dedupEvents(in.toDF.toDF("event_id", "ts"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      in.addData((1L, ts(0)), (1L, ts(1)), (2L, ts(2)), (2L, ts(2)), (3L, ts(3)))
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 3)
    } finally q.stop()
  }

  test("stateful funnel emits conversions incrementally across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Streams.Ev]
    val q = Streams.funnel(in.toDS())
      .writeStream.format("memory").queryName("funnel")
      .outputMode("append").start()
    try {
      in.addData(Streams.Ev(1L, "signup", ts(0)), Streams.Ev(2L, "purchase", ts(1)))
      q.processAllAvailable()
      assert(spark.table("funnel").count() == 0) // no conversion yet
      in.addData(Streams.Ev(1L, "purchase", ts(30))) // state carried over
      q.processAllAvailable()
      val conv = spark.table("funnel").as[Streams.Conversion].collect()
      assert(conv.toSeq == Seq(Streams.Conversion(1L, 0L, 30L * 60000000L, true)))
    } finally q.stop()
  }

  test("streaming session windows match the batch gaps-and-islands semantics") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val q = Streams.sessionCounts(in.toDF.toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    try {
      in.addData((ts(0), 1L), (ts(29), 1L), (ts(60), 1L))
      q.processAllAvailable()
      val rows = spark.table("sessions").select("n_events").as[Long].collect().sorted
      assert(rows.toSeq == Seq(1L, 2L)) // {0,29} merge; {60} splits
    } finally q.stop()
  }

  test("foreachBatch upsert sink is idempotent under batch replay") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    val target = dir + "/latest"
    val ckpt = dir + "/ckpt"
    val in = MemoryStream[(Long, Long, Timestamp, Double)]
    val q = Streams.latestStateQuery(
      in.toDF.toDF("event_id", "user_id", "ts", "value"), target, ckpt)
    try {
      in.addData((1L, 10L, ts(0), 1.0), (2L, 10L, ts(5), 2.0), (3L, 20L, ts(1), 9.0))
      q.processAllAvailable()
      val afterB1 = spark.read.parquet(target)
        .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
      assert(afterB1 == Map(10L -> 2L, 20L -> 3L), "latest per user after batch 1")
      in.addData((4L, 10L, ts(9), 4.0))
      q.processAllAvailable()
      val afterB2 = spark.read.parquet(target)
        .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
      assert(afterB2 == Map(10L -> 4L, 20L -> 3L), "latest per user after batch 2")
      // simulate a retried batch: replaying identical data must not change state
      val replay = spark.createDataFrame(Seq((4L, 10L, ts(9), 4.0)))
        .toDF("event_id", "user_id", "ts", "value")
      Streams.upsertLatest(replay, target)
      val afterReplay = spark.read.parquet(target)
        .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
      assert(afterReplay == afterB2, "replay converges to the same table")
    } finally q.stop()
  }

  test("file source ingests only new files, exactly once across restarts") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.types.{DoubleType, LongType, StructType}
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val in = dir + "/in"; val ckpt = dir + "/ckpt"
    new java.io.File(in).mkdirs()
    val schema = new StructType().add("event_id", LongType).add("value", DoubleType)
    def addFile(rows: Seq[(Long, Double)]): Unit =
      spark.createDataFrame(rows).toDF("event_id", "value")
        .coalesce(1).write.mode("append").parquet(in)

    // every (batchId, ids) delivery, surviving query restarts
    val seen = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
    def start() = Streams.fileIngest(spark, in, schema).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        val ids = b.select("event_id").as[Long].collect().toSeq.sorted
        seen.synchronized { seen += ids }
        ()
      }.start()

    addFile(Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(seen.flatten.sorted == Seq(1L, 2L, 3L))
      addFile(Seq((4L, 4.0), (5L, 5.0)))           // new file mid-stream
      val before = seen.size
      q1.processAllAvailable()
      assert(seen.drop(before).flatten.sorted == Seq(4L, 5L),
        "a micro-batch after new files arrive must contain ONLY the new file")
    } finally q1.stop()

    addFile(Seq((6L, 6.0), (7L, 7.0)))             // arrives while query is DOWN
    val before = seen.size
    val q2 = start()                               // same checkpoint
    try {
      q2.processAllAvailable()
      assert(seen.drop(before).flatten.sorted == Seq(6L, 7L),
        "restart from checkpoint must skip already-committed files")
    } finally q2.stop()
    // exactly-once: across both query incarnations every row delivered once
    assert(seen.flatten.sorted == (1L to 7L),
      s"each input row must be delivered exactly once, got ${seen.toList}")
  }

  test("Trigger.AvailableNow drains pending files then stops itself (cron-batch mode)") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.{DoubleType, LongType, StructType}
    val dir = java.nio.file.Files.createTempDirectory("graft-avnow").toString
    val in = dir + "/in"; val ckpt = dir + "/ckpt"
    new java.io.File(in).mkdirs()
    val schema = new StructType().add("event_id", LongType).add("value", DoubleType)
    def addFile(rows: Seq[(Long, Double)]): Unit =
      spark.createDataFrame(rows).toDF("event_id", "value")
        .coalesce(1).write.mode("append").parquet(in)
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    def runOnce(): Unit = {
      val q = Streams.fileIngest(spark, in, schema).writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          val ids = b.select("event_id").as[Long].collect()
          seen.synchronized { seen ++= ids }
          ()
        }.start()
      // AvailableNow must terminate ON ITS OWN once the backlog is drained —
      // that self-stop is what lets a cron job run the stream as a batch
      assert(q.awaitTermination(120000), "query should self-terminate")
    }
    addFile(Seq((1L, 1.0), (2L, 2.0)))
    addFile(Seq((3L, 3.0)))
    runOnce()                                     // first scheduled run
    assert(seen.sorted.toSeq == Seq(1L, 2L, 3L))
    addFile(Seq((4L, 4.0)))                       // lands between runs
    runOnce()                                     // next scheduled run
    assert(seen.sorted.toSeq == (1L to 4L),
      "second run must pick up exactly the files that arrived in between")
  }

  test("stream-stream interval join attributes clicks within the 1h horizon") {
    implicit val sqlCtx = spark.sqlContext
    // modern event times on purpose: near-epoch (1970) timestamps trip the
    // symmetric hash join's watermark bookkeeping (verified empirically —
    // even an equi-only stream-stream join silently drops matches there)
    val base = 1700000000000L
    def mts(min: Long): Timestamp = new Timestamp(base + min * 60000L)
    val imps = MemoryStream[(Long, Long, Timestamp)]
    val clks = MemoryStream[(Long, Timestamp)]
    val q = Streams.attributeClicks(
        imps.toDF.toDF("imp_id", "user_id", "imp_ts"),
        clks.toDF.toDF("click_imp_id", "click_ts"))
      .writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()
    try {
      imps.addData((100L, 1L, mts(0)), (200L, 2L, mts(10)))
      // in-horizon click, out-of-horizon click (>1h later), unknown imp_id
      clks.addData((100L, mts(30)), (200L, mts(80)), (999L, mts(5)))
      q.processAllAvailable()
      val got = spark.table("attributed")
        .select("imp_id").as[Long].collect().toSeq
      assert(got == Seq(100L),
        s"only the within-1h click on a known impression attributes, got $got")
    } finally q.stop()
  }
  test("streaming twins are total on dirty rows (null ts / type / user)") {
    // a production stream carries the same damage the batch dirty corpus
    // does; the twins must process the micro-batch, not kill the query —
    // null event-time rows have no window and are dropped by the
    // aggregation, null keys group/dedup as their own bucket
    implicit val sqlCtx = spark.sqlContext
    val inT = MemoryStream[(Timestamp, String)]
    val qT = Streams.tumblingCounts(inT.toDF.toDF("ts", "event_type"))
      .writeStream.format("memory").queryName("dirty_tumbling")
      .outputMode("complete").start()
    try {
      inT.addData((ts(1), "view"), (null, "view"), (ts(5), null),
        (null, null), (ts(70), ""))
      qT.processAllAvailable()
      val n = spark.table("dirty_tumbling")
        .agg(sum(col("n"))).collect()(0).getLong(0)
      assert(n >= 3, s"clean-ts rows must still aggregate, got $n")
    } finally qT.stop()

    val inS = MemoryStream[(Timestamp, java.lang.Long)]
    val qS = Streams.sessionCounts(inS.toDF.toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("dirty_sessions")
      .outputMode("complete").start()
    try {
      inS.addData((ts(1), 1L), (null, 1L), (ts(5), null))
      qS.processAllAvailable()
      assert(spark.table("dirty_sessions").collect().nonEmpty)
    } finally qS.stop()

    val inD = MemoryStream[(Timestamp, java.lang.Long)]
    val qD = Streams.dedupEvents(inD.toDF.toDF("ts", "event_id"))
      .writeStream.format("memory").queryName("dirty_dedup")
      .outputMode("append").start()
    try {
      inD.addData((ts(1), 1L), (ts(2), null), (ts(3), null), (ts(4), 1L))
      qD.processAllAvailable()
      assert(spark.table("dirty_dedup").collect().nonEmpty)
    } finally qD.stop()
  }

  private val baseText =
    "the quick brown fox jumps over the lazy dog while seven wizards " +
      "brew strong potions beside the glass river and count shining stars "
  private val otherText =
    "completely different content about databases and distributed " +
      "systems joining shuffling aggregating partitions at petabyte scale "
  // ~260 distinct char-5-grams; a few appended chars keep exact Jaccard
  // against the unsuffixed text ≈ 0.97, far above the 0.8 verify bound
  private val longText = baseText + otherText

  test("streaming dedup ingest flags cross-batch twins through foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-dedupingest").toString
    val assets = dir + "/assets"; val ckpt = dir + "/ckpt"
    val in = MemoryStream[(Long, String, String)]
    val q = Streams.dedupIngestQuery(
      in.toDF.toDF("doc_id", "lang", "text"), assets, ckpt)
    try {
      // batch 0: four originals — everything admits
      in.addData((1L, "en", longText), (2L, "en", otherText * 3),
        (3L, "de", baseText * 2), (4L, "en", "tiny"))
      q.processAllAvailable()
      // batch 1: an exact twin of 2, a near twin of 1 (a short suffix on a
      // long text), the SAME near-twin text under a different lang (bands
      // key on lang: must NOT match doc 1 and must admit), a fresh doc
      in.addData((11L, "en", longText + "zz9q7"),
        (12L, "en", otherText * 3), (13L, "fr", longText + "zz9q7"),
        (14L, "en", otherText.take(40) + baseText.takeRight(40)))
      q.processAllAvailable()
    } finally q.stop()
    val st = spark.read.parquet(assets + "/status")
      .where(col("src_batch") === 1)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("status")).toMap
    assert(st == Map(11L -> "near_dup", 12L -> "exact_dup",
      13L -> "new", 14L -> "new"), s"batch-1 statuses: $st")
    val b0 = spark.read.parquet(assets + "/status")
      .where(col("src_batch") === 0)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("status")).toMap
    assert(b0.values.forall(_ == "new"), s"batch-0 statuses: $b0")
    // only accepted docs extended the history hash set: 4 from batch 0
    // plus the two accepted in batch 1 (13 and 14)
    assert(spark.read.parquet(assets + "/hashes").count() == 6)
  }

  test("dedup ingest batch replay is idempotent: same verdicts, no asset dups") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedupreplay").toString
    val assets = dir + "/assets"
    def docs(rows: (Long, String, String)*) =
      spark.createDataFrame(rows).toDF("doc_id", "lang", "text")
    Streams.dedupIngestBatch(
      docs((1L, "en", longText), (2L, "en", otherText * 3)), assets, 0L)
    def run1() = Streams.dedupIngestBatch(
      docs((11L, "en", longText), (12L, "en", longText + "zz9q7")),
      assets, 1L)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("status")).toMap
    val first = run1()
    assert(first == Map(11L -> "exact_dup", 12L -> "near_dup"), s"got $first")
    // the retry case foreachBatch must tolerate: re-running the same
    // batch id recomputes against the same history view (src_batch < 1)
    // and overwrites its own partitions — verdicts identical, assets not
    // duplicated (11/12 were dups, so history stays at batch 0's 2 docs)
    val replay = run1()
    assert(replay == first, "replayed verdicts diverge")
    assert(spark.read.parquet(assets + "/hashes").count() == 2)
    assert(spark.read.parquet(assets + "/arrays").count() == 2)
    // a later batch still dedups against history extended by ACCEPTED docs
    val b2 = Streams.dedupIngestBatch(
      docs((21L, "en", otherText * 3)), assets, 2L)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(b2 == Map(21L -> "exact_dup"), s"got $b2")
  }

  test("dedup ingest query recovers from a crash between asset write and batch commit") {
    // The r8 replay spec proved idempotence at the dedupIngestBatch level;
    // this is the END-TO-END claim: a real StreamingQuery dies AFTER the
    // batch's asset partitions are written but BEFORE the engine commits
    // the batch to the checkpoint (the exact window a lost driver hits),
    // restarts from the checkpoint, replays the uncommitted batch — and
    // the asset directory plus statuses come out identical to a run that
    // never crashed.
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-dedupcrash").toString
    val assets = dir + "/assets"; val ckpt = dir + "/ckpt"
    val cleanAssets = dir + "/assets_clean"; val cleanCkpt = dir + "/ckpt_clean"
    val batch0 = Seq((1L, "en", longText), (2L, "en", otherText * 3))
    val batch1 = Seq((11L, "en", longText + "zz9q7"), (12L, "en", otherText * 3),
      (13L, "en", baseText.take(40) + otherText.takeRight(40)))

    // interrupted run: foreachBatch finishes the asset write for batch 1,
    // then the "driver dies" before the engine records the commit
    val in = MemoryStream[(Long, String, String)]
    @volatile var crashed = false
    def start() = in.toDF.toDF("doc_id", "lang", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        Streams.dedupIngestBatch(b, assets, id)
        if (id == 1L && !crashed) {
          crashed = true
          throw new RuntimeException("injected crash after asset write")
        }
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
    val q1 = start()
    in.addData(batch0: _*)
    q1.processAllAvailable()
    in.addData(batch1: _*)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable(); q1.awaitTermination()
    }
    assert(crashed, "the injected crash never fired")
    // batch 1's assets ARE on disk (that is the window under test) but the
    // checkpoint has no commit for it
    assert(spark.read.parquet(assets + "/status")
      .where(col("src_batch") === 1).count() == 3)
    // restart from the same checkpoint: the engine replays batch 1
    val q2 = start()
    q2.processAllAvailable(); q2.stop()

    // uninterrupted twin over the same data
    val in2 = MemoryStream[(Long, String, String)]
    val qc = Streams.dedupIngestQuery(
      in2.toDF.toDF("doc_id", "lang", "text"), cleanAssets, cleanCkpt)
    in2.addData(batch0: _*); qc.processAllAvailable()
    in2.addData(batch1: _*); qc.processAllAvailable(); qc.stop()

    // full asset-state equality, every subdirectory, both directions
    for (sub <- Seq("status", "hashes", "bands", "arrays")) {
      val a = spark.read.parquet(s"$assets/$sub")
      val b = spark.read.parquet(s"$cleanAssets/$sub")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$sub diverges between crashed-and-recovered and clean runs")
    }
    // and the verdicts are the expected ones (11 near of 1, 12 exact of 2,
    // 13 new — the recombined halves share no 5-gram mass above 0.8)
    val st = spark.read.parquet(assets + "/status")
      .where(col("src_batch") === 1)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("status")).toMap
    assert(st == Map(11L -> "near_dup", 12L -> "exact_dup", 13L -> "new"),
      s"recovered batch-1 statuses: $st")
  }

  test("dedup ingest is total on an empty micro-batch (dry trigger)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedupdry").toString
    val assets = dir + "/assets"
    def docs(rows: (Long, String, String)*) =
      spark.createDataFrame(rows).toDF("doc_id", "lang", "text")
    val empty = docs((0L, "x", "y")).limit(0)
    // an empty FIRST batch (no history yet) and an empty LATER batch must
    // both no-op cleanly — a dry trigger happens daily in production
    assert(Streams.dedupIngestBatch(empty, assets, 0L).count() == 0)
    val st = Streams.dedupIngestBatch(docs((1L, "en", longText)), assets, 1L)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("status")).toMap
    assert(st == Map(1L -> "new"))
    assert(Streams.dedupIngestBatch(empty, assets, 2L).count() == 0)
    // the dry batches contributed nothing to history
    assert(spark.read.parquet(assets + "/hashes").count() == 1)
    val again = Streams.dedupIngestBatch(docs((2L, "en", longText)), assets, 3L)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("status")).toMap
    assert(again == Map(2L -> "exact_dup"), s"got $again")
  }

  test("dedup ingest honors the production minhash dials and pins asset geometry") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedupdials").toString
    val assets = dir + "/assets"
    def docs(rows: (Long, String, String)*) =
      spark.createDataFrame(rows).toDF("doc_id", "lang", "text")
    spark.conf.set("spark.graft.minhash.k", "60")
    spark.conf.set("spark.graft.minhash.r", "5")
    try {
      Streams.dedupIngestBatch(docs((1L, "en", longText)), assets, 0L)
      // 12 bands of 5 lanes per doc in the persisted index
      assert(spark.read.parquet(assets + "/bands")
        .where(col("src_batch") === 0).count() == 12)
      val st = Streams.dedupIngestBatch(
        docs((11L, "en", longText + "zz9q7"), (12L, "en", otherText * 2)),
        assets, 1L)
        .collect().map(r => r.getLong(0) -> r.getAs[String]("status")).toMap
      assert(st == Map(11L -> "near_dup", 12L -> "new"), s"got $st")
      // the (k, r) the index was built at is pinned: re-dialing the
      // session mid-directory must refuse, not silently probe nothing
      spark.conf.set("spark.graft.minhash.r", "4")
      val e = intercept[IllegalArgumentException] {
        Streams.dedupIngestBatch(docs((21L, "en", baseText)), assets, 2L)
      }
      assert(e.getMessage.contains("re-sketch"))
    } finally {
      spark.conf.unset("spark.graft.minhash.k")
      spark.conf.unset("spark.graft.minhash.r")
    }
  }
}
