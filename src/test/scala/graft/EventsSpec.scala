package graft

import org.apache.spark.sql.functions._

import graft.operators.Events

class EventsSpec extends SparkSpecBase {

  test("events load: nanos ts surfaces as long + derived micro timestamp") {
    val ev = Events.load(spark, sf)
    assert(ev.schema("ts").dataType.typeName == "long")
    val r = ev.select(col("ts"), col("ts_us")).head
    assert(r.getLong(0) / 1000 == r.getLong(1))
  }

  test("hourly windows partition all events") {
    val agg = Events.hourlyWindows(spark, sf)
    val total = agg.agg(sum("n_events")).head.getLong(0)
    assert(total == Events.load(spark, sf).count())
    // window starts are hour-aligned epoch micros
    assert(agg.where(expr("ws_us % 3600000000 != 0")).count() == 0)
  }

  test("sessionization: gaps within session <= 30min, across sessions > 30min") {
    val sess = Events.sessionize(spark, sf).collect()
    sess.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("session_seq"))
      ordered.zip(ordered.drop(1)).foreach { case (a, b) =>
        // next session starts > 30 min after previous session's last event
        assert(b.getAs[Long]("start_us") - a.getAs[Long]("end_us") > 30L * 60 * 1000000)
      }
    }
    val total = sess.map(_.getAs[Long]("n_events")).sum
    assert(total == Events.load(spark, sf).count())
  }

  test("as-of join: purchase is latest at-or-before the click") {
    val ev = Events.load(spark, sf)
      .where(col("event_type").isin("click", "purchase"))
      .select("event_id", "user_id", "ts_us", "event_type").collect()
    val purchByUser = ev.filter(_.getAs[String]("event_type") == "purchase")
      .groupBy(_.getAs[Long]("user_id"))
    val rows = Events.asofClickPurchase(spark, sf).collect()
    assert(rows.length == ev.count(_.getAs[String]("event_type") == "click"))
    rows.foreach { r =>
      val user = r.getAs[Long]("user_id")
      val clickTs = r.getAs[Long]("click_ts")
      val best = purchByUser.getOrElse(user, Array.empty)
        .filter(_.getAs[Long]("ts_us") <= clickTs)
        .sortBy(p => (p.getAs[Long]("ts_us"), p.getAs[Long]("event_id")))
        .lastOption
      best match {
        case Some(p) =>
          assert(r.getAs[Long]("purchase_ts") == p.getAs[Long]("ts_us"))
          assert(r.getAs[Long]("gap_us") == clickTs - p.getAs[Long]("ts_us"))
        case None => assert(r.isNullAt(r.fieldIndex("purchase_id")))
      }
    }
  }

  test("bounded as-of: match kept iff within the window, else all-null") {
    val bound = 24L * 3600 * 1000000
    val base = Events.asofClickPurchase(spark, sf).collect()
      .map(r => r.getAs[Long]("click_id") ->
        (if (r.isNullAt(r.fieldIndex("gap_us"))) None
         else Some(r.getAs[Long]("gap_us")))).toMap
    val rows = Events.asofClickPurchaseBounded(spark, sf).collect()
    assert(rows.length == base.size)
    rows.foreach { r =>
      val inWindow = base(r.getAs[Long]("click_id")).exists(_ <= bound)
      assert(r.isNullAt(r.fieldIndex("purchase_id")) == !inWindow)
      assert(r.isNullAt(r.fieldIndex("purchase_ts")) == !inWindow)
      if (inWindow) assert(r.getAs[Long]("gap_us") <= bound)
    }
    // the fixture exercises BOTH branches
    assert(rows.exists(_.isNullAt(rows.head.fieldIndex("purchase_id"))))
    assert(rows.exists(!_.isNullAt(rows.head.fieldIndex("purchase_id"))))
  }

  test("json props: k extracted for every event") {
    val rows = Events.jsonProps(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum == Events.load(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Int]("min_k") <= r.getAs[Int]("max_k"))
    }
  }
}
