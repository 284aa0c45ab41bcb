package graft

import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("s_window_agg equals the batch window aggregation") {
    val streamed = Registry.byName("s_window_agg").fn(spark, dir).collect()
    val batch = Tables.tbl(spark, dir, "events")
      .groupBy(date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("hour_start", "event_type")
      .collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getAs[String]("hour_start") == b.getAs[String]("hour_start"))
      assert(s.getAs[Long]("n_events") == b.getAs[Long]("n_events"))
    }
  }

  test("s_sessionize: sessions cover all events with 30-min gaps respected") {
    val sessions = Registry.byName("s_sessionize").fn(spark, dir).collect()
    val nEvents = Tables.tbl(spark, dir, "events").count()
    assert(sessions.map(_.getAs[Long]("n_events")).sum == nEvents)
    // within each user, consecutive sessions are separated by > 30 min
    sessions.groupBy(_.getAs[Long]("user_id")).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.getAs[Long]("session_start"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("session_start") -
            a.getAs[Long]("session_end") > 1800L)
        case _ =>
      }
      // sessions are internally consistent
      sorted.foreach(s => assert(
        s.getAs[Long]("session_end") >= s.getAs[Long]("session_start")))
    }
  }

  test("s_dedup_stream restores exact per-type counts after doubling") {
    val deduped = Registry.byName("s_dedup_stream").fn(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_events"))
      .toMap
    val batch = Tables.tbl(spark, dir, "events")
      .groupBy("event_type").count().collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count"))
      .toMap
    assert(deduped == batch)
  }

  test("multimodal features are deterministic and complete") {
    val out = Registry.byName("m_multimodal_meta").fn(spark, dir).collect()
    val nDocs = Tables.tbl(spark, dir, "documents").count()
    assert(out.length == nDocs)
    assert(out.forall(_.getAs[Long]("n_bytes") > 0))
    val e = out.map(_.getAs[Double]("byte_entropy"))
    assert(e.forall(x => x >= 0.0 && x <= 4.0)) // 16 bins → max 4 bits
  }
}
