package graft.streaming

import graft.{GraftQuery, Help}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** §2.5 Structured Streaming over the events table.
  *
  * Each query drives a REAL streaming pipeline (readStream → transform →
  * writeStream, Trigger.AvailableNow, memory sink) and returns the sink
  * table, so the driver's batch-shaped contract still holds. Watermarks
  * bound state; keyed state (sessionization) is hash-partitioned across
  * executors by user_id — the 100 TB shape is the same pipeline with a
  * continuous trigger and a durable sink.
  */
object StreamingQueries {
  import Help._

  /** events.parquet carries TIMESTAMP(NANOS) — streamed as long + rebuilt
    * (micros) exactly like the batch-side Tables.tbl.
    */
  private val eventSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The streaming file source wants a DIRECTORY; stage a symlink to the
    * single events.parquet file (read-only testdata stays untouched).
    */
  private def stageEvents(s: SparkSession, dir: String): String = {
    val staging = java.nio.file.Paths.get(
      s"/root/repo/target/stream-src/${Integer.toHexString(dir.hashCode)}")
    java.nio.file.Files.createDirectories(staging)
    val link = staging.resolve("events.parquet")
    if (!java.nio.file.Files.exists(link))
      java.nio.file.Files.createSymbolicLink(
        link, java.nio.file.Paths.get(s"$dir/events.parquet"))
    staging.toString
  }

  private def eventStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", Int.MaxValue.toString)
      .parquet(stageEvents(s, dir))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Sessionize a directory of raw event parquet files (ts as long
    * nanos), reading `maxFiles` files per micro-batch. Sessions CLOSE
    * when the event-time watermark passes session_end + gap
    * (EventTimeTimeout) — the same session set emerges whether a user's
    * history arrives in one batch or across many; each user's trailing
    * session stays open awaiting more data, exactly as a continuous
    * pipeline would. StreamingSpec feeds the same events as 1 and as 3
    * time-ordered batches and asserts identical output.
    */
  def sessionizeDir(s: SparkSession, srcDir: String,
      maxFiles: Int): DataFrame = {
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the WATERMARKED column itself must flow into the grouped Dataset —
    // casting it away makes EventTimeTimeout unusable; convert to epoch
    // seconds inside the state function instead
    val evs = s.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", maxFiles.toString)
      .parquet(srcDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "2 hours")
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
    val sessions = evs
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        Sessionizer.apply)
    runToTable(s, sessions.toDF(), "s_sessionize", OutputMode.Append())
  }

  private def runToTable(s: SparkSession, df: DataFrame, name: String,
      mode: OutputMode): DataFrame = {
    val qname = s"${name}_${System.nanoTime}"
    val q = df.writeStream.format("memory").queryName(qname)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table(qname)
  }

  def queries: Seq[GraftQuery] = Seq(
    // Tumbling-window event aggregation with a watermark; oracle is the
    // equivalent batch time-bucket SQL.
    GraftQuery(
      "s_window_agg",
      (s, dir) => {
        val agg = eventStream(s, dir)
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            r4(dsum(col("value"))).as("sum_value"))
        runToTable(s, agg, "s_window_agg", OutputMode.Complete())
          .select(
            date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
              .as("hour_start"),
            col("event_type"), col("n_events"), col("sum_value"))
          .orderBy("hour_start", "event_type")
      },
      Some(s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
          AS hour_start, event_type, COUNT(*) AS n_events,
        ${sqlDsum("value")} AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""")),

    // Sessionization (30-min inactivity gap) via flatMapGroupsWithState —
    // custom keyed state the built-ins can't express, closed by
    // EventTimeTimeout so sessions survive micro-batch boundaries.
    GraftQuery(
      "s_sessionize",
      (s, dir) =>
        sessionizeDir(s, stageEvents(s, dir), Int.MaxValue)
          .orderBy("user_id", "session_start"),
      None),

    // Streaming → DURABLE TABLE sink: append-mode windowed aggregation
    // (only watermark-finalized windows emit) committed to a GraftTable
    // snapshot per micro-batch via foreachBatch — the production shape,
    // where nothing accumulates on the driver. The readback scans the
    // table like any batch consumer.
    GraftQuery(
      "s_stream_table_sink",
      (s, dir) => {
        val agg = eventStream(s, dir)
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("window.start").as("hour_start"), col("event_type"),
            col("n_events"))
        val root = java.nio.file.Files
          .createTempDirectory("stream-sink").toString
        val t = graft.table.GraftTable.create(s, s"$root/t", agg.schema)
        val q = t.appendStream(agg, s"$root/ckpt")
        q.awaitTermination()
        t.scan()
          .select(date_format(col("hour_start"), "yyyy-MM-dd HH:mm:ss")
            .as("hour_start"), col("event_type"), col("n_events"))
          .orderBy("hour_start", "event_type")
      },
      // append mode finalizes a window once the watermark (max ts − 1h)
      // passes its end: hour buckets with end ≤ max(ts) − 1h
      Some("""WITH m AS (SELECT max(ts) AS mx FROM events)
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
            AS hour_start, event_type, COUNT(*) AS n_events
        FROM events, m
        WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= mx - INTERVAL 1 HOUR
        GROUP BY 1, 2, m.mx ORDER BY hour_start, event_type""")),

    // Streaming dedup inside the watermark: the stream is doubled (every
    // event appears twice) and dropDuplicates restores exact counts.
    GraftQuery(
      "s_dedup_stream",
      (s, dir) => {
        val doubled = eventStream(s, dir)
          .withColumn("copy", explode(array(lit(1), lit(2))))
          .drop("copy")
        val deduped = doubled
          .withWatermark("ts", "1 hour")
          .dropDuplicates("event_id")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"))
        runToTable(s, deduped, "s_dedup_stream", OutputMode.Complete())
          .orderBy("event_type")
      },
      None)
  )
}

/** Session summary emitted per closed session. */
case class SessionOut(user_id: Long, session_start: Long, session_end: Long,
    n_events: Long)

/** Per-user sessionizer: splits the user's event times at >30-min gaps.
  * The trailing session stays OPEN in state across micro-batches; it is
  * emitted either when a later batch proves the gap was exceeded, or when
  * the event-time watermark passes session_end + gap (EventTimeTimeout).
  * A session is therefore emitted exactly once, whether the user's
  * history arrives in one batch or across many.
  */
object Sessionizer {
  private val GapSeconds = 30L * 60L

  def apply(userId: Long, rows: Iterator[(Long, java.sql.Timestamp)],
      state: GroupState[SessionOut]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      // watermark passed session_end + gap: no on-time event can extend
      // this session anymore — close it
      val open = state.get
      state.remove()
      return Iterator.single(open)
    }
    val times = rows.map(_._2.getTime / 1000L).toArray.sorted
    if (times.isEmpty) return Iterator.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]

    /** Plain ascending gap-walk from a seed session; emits closed ones. */
    def walk(ts: Seq[Long], s0: Long, e0: Long, n0: Long): (Long, Long, Long) = {
      var (cs, ce, cn) = (s0, e0, n0)
      ts.foreach { t =>
        if (t <= ce) { if (t < cs) cs = t; cn += 1L } // late, inside span
        else if (t - ce <= GapSeconds) { ce = t; cn += 1L }
        else {
          out += SessionOut(userId, cs, ce, cn)
          cs = t; ce = t; cn = 1L
        }
      }
      (cs, ce, cn)
    }

    // the watermark admits LATE events (up to its delay): an event inside
    // or within a gap of the open session merges without regressing its
    // bounds; events more than a gap BEFORE its start form their own
    // earlier sessions, final by construction — the open session's
    // existence proves the separating gap
    val (start, end, n) = state.getOption match {
      case Some(open) =>
        val (pre, rest) =
          times.partition(_ < open.session_start - GapSeconds)
        if (pre.nonEmpty) {
          val (ps, pe, pn) = walk(pre.tail, pre.head, pre.head, 1L)
          out += SessionOut(userId, ps, pe, pn)
        }
        walk(rest, open.session_start, open.session_end, open.n_events)
      case None =>
        walk(times.tail, times.head, times.head, 1L)
    }
    state.update(SessionOut(userId, start, end, n))
    // close at end + gap in event time; never set a timeout at or before
    // the current watermark (the API rejects it for already-late state)
    state.setTimeoutTimestamp(math.max((end + GapSeconds) * 1000L,
      state.getCurrentWatermarkMs + 1000L))
    out.iterator
  }
}
