package graft.queries

import graft.SparkSpec

/** Semantic pins for the warehouse/advisory tier (q80, q81, q87,
  * q88): each query is recomputed brute-force in plain Scala over
  * sf0.001 — independent of both the Spark plan under test and the
  * DuckDB oracle.
  */
class WarehouseTierSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def r(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q80 cube emits all four grouping sets, each matching a plain agg") {
    val rows = sf("lineitem", dir)
      .select("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice")
      .collect()
      .map(x => (x.getString(0), x.getString(1), x.getDouble(2),
        x.getDouble(3))).toSeq
    // gid bit convention: grouping_id() sets the bit when the column
    // is AGGREGATED AWAY (1 = rolled up), returnflag is the high bit.
    def agg(keyOf: ((String, String, Double, Double)) => (Option[String],
        Option[String]), gid: Int) =
      rows.groupBy(keyOf).map { case ((rf, ls), g) =>
        Seq[Any](rf.orNull, ls.orNull, gid,
          g.map(_._3).sum, r(g.map(_._4).sum, 2), g.size.toLong)
      }.toSeq
    val expected =
      agg(t => (Some(t._1), Some(t._2)), 0) ++
        agg(t => (Some(t._1), None), 1) ++
        agg(t => (None, Some(t._2)), 2) ++
        agg(_ => (None, None), 3)
    assertSameRows(Relational.q80.run(spark, dir), expected)
  }

  test("q81 finds exactly the lev<=1 in-block pairs for every probe") {
    val names = sf("customer", dir).select("c_custkey", "c_name")
      .collect().map(x => x.getLong(0) -> x.getString(1)).toSeq
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = for {
      (pk, pn) <- names if pk % 50 == 0
      (mk, mn) <- names
      if mk != pk && pn.take(16) == mn.take(16) && lev(pn, mn) <= 1
    } yield Seq[Any](pk, mk, lev(pn, mn))
    assert(expected.nonEmpty, "fixture must yield candidate pairs")
    assertSameRows(Relational.q81.run(spark, dir), expected)
  }

  test("q87 SCD2 intervals tile each user's history exactly") {
    val ev = sf("events", dir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(x => (x.getLong(0), x.getLong(1) / 1000L, x.getLong(2),
        x.getString(3))).toSeq
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (uid, g) =>
      val sorted = g.sortBy(t => (t._2, t._3))
      val runs = sorted.foldLeft(Vector.empty[(String, Long)]) {
        case (acc, (_, us, _, et)) =>
          if (acc.nonEmpty && acc.last._1 == et) acc else acc :+ (et, us)
      }
      runs.zipWithIndex.map { case ((et, from), i) =>
        val to = if (i + 1 < runs.size) runs(i + 1)._2: java.lang.Long
          else null
        Seq[Any](uid, i + 1, et, from, to, to == null)
      }
    }
    val got = Relational.q87.run(spark, dir)
    // intervals must tile: version k's valid_to == version k+1's
    // valid_from, exactly one open (current) interval per user
    assertSameRows(got, expected)
    val opens = got.collect().filter(_.getBoolean(5))
    assert(opens.map(_.getLong(0)).distinct.length == opens.length)
  }

  test("q93 pivot equals per-(user, type) conditional sums") {
    val ev = sf("events", dir)
      .select("user_id", "event_type", "value").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getDouble(2))).toSeq
    val types = Seq("click", "error", "purchase", "signup", "view")
    val expected = ev.groupBy(_._1).toSeq.map { case (uid, g) =>
      Seq[Any](uid) ++ types.map { t =>
        val vs = g.filter(_._2 == t).map(_._3)
        if (vs.isEmpty) null else r(vs.sum, 2): java.lang.Double
      }
    }
    assertSameRows(Relational.q93.run(spark, dir), expected)
  }

  test("q94 unpivot emits one (flag, metric, value) row per wide cell") {
    val li = sf("lineitem", dir)
      .select("l_returnflag", "l_quantity", "l_extendedprice",
        "l_discount").collect()
      .map(x => (x.getString(0), x.getDouble(1), x.getDouble(2),
        x.getDouble(3))).toSeq
    val expected = li.groupBy(_._1).toSeq.flatMap { case (f, g) =>
      Seq(
        Seq[Any](f, "sum_qty", r(g.map(_._2).sum, 2)),
        Seq[Any](f, "sum_price", r(g.map(_._3).sum, 2)),
        Seq[Any](f, "avg_disc", r(g.map(_._4).sum / g.size, 4)))
    }
    assertSameRows(Relational.q94.run(spark, dir), expected)
  }

  test("q97 forward as-of picks each purchase's earliest future click") {
    val ev = sf("events", dir)
      .select("event_id", "user_id", "ts", "event_type", "value")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2) / 1000L,
        x.getString(3), x.getDouble(4))).toSeq
    val clicks = ev.filter(_._4 == "click")
      .groupBy(_._2).view.mapValues(_.map(c => (c._3, c._5))).toMap
    val expected = ev.filter(_._4 == "purchase").map {
      case (eid, uid, us, _, _) =>
        val next = clicks.getOrElse(uid, Nil)
          .filter(_._1 >= us).sorted.headOption
        Seq[Any](eid, uid,
          new java.sql.Timestamp(us / 1000).toLocalDateTime
            .plusNanos((us % 1000) * 1000),
          next.map(n => new java.sql.Timestamp(n._1 / 1000)
            .toLocalDateTime.plusNanos((n._1 % 1000) * 1000)).orNull,
          next.map(n => n._2: java.lang.Double).orNull)
    }
    assertSameRows(Relational.q97.run(spark, dir), expected)
  }

  test("q98 zero-fills exactly the hours with no events") {
    // session tz = UTC, so the hour column's epoch seconds are the
    // tz-safe comparison key
    val got = Relational.q98.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000,
        r.getLong(2), r.getDouble(3)))
    val types = got.map(_._1).distinct.sorted
    val hours = got.map(_._2).distinct.sorted
    // dense grid: every (type, hour) appears exactly once, hours are
    // a contiguous hourly spine
    assert(got.length == types.length * hours.length)
    hours.sliding(2).foreach { case Array(a, b) =>
      assert(b - a == 3600L, s"$a → $b")
    }
    // the filled rows agree with a brute-force rollup; absent = (0, 0)
    val ev = sf("events", dir).select("event_type", "ts", "value")
      .collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2))).toSeq
    val rolled = ev.groupBy { case (t, ns, _) =>
      (t, ns / 1_000_000_000L / 3600 * 3600)
    }.map { case ((t, h), g) =>
      (t, h) -> (g.size.toLong, r(g.map(_._3).sum, 2))
    }
    got.foreach { case (t, h, n, total) =>
      rolled.get((t, h)) match {
        case Some((en, et)) => assert(n == en && total == et, s"($t,$h)")
        case None => assert(n == 0L && total == 0.0, s"($t,$h)")
      }
    }
    assert(got.exists(_._3 == 0L), "fixture must have gaps to fill")
  }

  test("q103 splits credit 1/n over the prior-10-minute clicks") {
    val ev = sf("events", dir)
      .select("event_id", "user_id", "ts", "event_type").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2) / 1000L,
        x.getString(3))).toSeq
    val clicks = ev.filter(_._4 == "click")
      .groupBy(_._2).view.mapValues(_.map(c => (c._1, c._3))).toMap
    val tenMinUs = 10L * 60 * 1000 * 1000
    val expected = ev.filter(_._4 == "purchase").flatMap {
      case (pid, uid, pus, _) =>
        val contrib = clicks.getOrElse(uid, Nil)
          .filter(c => c._2 <= pus && c._2 > pus - tenMinUs)
        contrib.map { case (cid, _) =>
          Seq[Any](pid, cid, r(1.0 / contrib.size, 4)) }
    }
    assert(expected.nonEmpty, "fixture must yield attributed clicks")
    assertSameRows(Relational.q103.run(spark, dir), expected)
  }

  test("q104 funnel counts are monotone and match brute force") {
    val ev = sf("events", dir)
      .select("user_id", "ts", "event_type").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSeq
    val byUser = ev.groupBy(_._1)
    def minAfter(g: Seq[(Long, Long, String)], t: String,
        after: Option[Long]): Option[Long] = after.flatMap { a =>
      val c = g.filter(e => e._3 == t && e._2 > a)
      if (c.isEmpty) None else Some(c.map(_._2).min)
    }
    val depths = byUser.values.map { g =>
      val t1 = { val c = g.filter(_._3 == "click")
        if (c.isEmpty) None else Some(c.map(_._2).min) }
      val t2 = minAfter(g, "view", t1)
      val t3 = minAfter(g, "purchase", t2)
      Seq(t1, t2, t3).takeWhile(_.isDefined).size
    }.toSeq
    val expected = (1 to 3).map(s =>
      Seq[Any](s, depths.count(_ >= s).toLong))
    val got = Relational.q104.run(spark, dir)
    assertSameRows(got, expected)
    val ns = got.collect().map(_.getLong(1))
    assert(ns.sliding(2).forall { case Array(a, b) => b <= a })
  }

  test("q105 retention cells match a brute-force cohort rollup") {
    val ev = sf("events", dir).select("user_id", "ts").collect()
      .map(x => (x.getLong(0), x.getLong(1) / 1_000_000_000L / 86400))
      .toSeq
    val cohort = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = ev.distinct.groupBy { case (u, d) =>
      (cohort(u), (d - cohort(u)).toInt) }.toSeq
      .map { case ((cd, off), g) =>
        Seq[Any](java.time.LocalDate.ofEpochDay(cd), off,
          g.map(_._1).distinct.size.toLong) }
    assertSameRows(Relational.q105.run(spark, dir), expected)
  }

  test("q88 profiles the heaviest keys with ceil-of-rounded salts") {
    val ev = sf("events", dir).select("user_id").collect()
      .map(_.getLong(0)).toSeq
    val cnt = ev.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val avg = cnt.values.sum.toDouble / cnt.size
    val expected = cnt.toSeq.sortBy { case (k, c) => (-c, k) }.take(10)
      .map { case (k, c) =>
        val ratio = r(c / avg, 4)
        Seq[Any](k, c, ratio, ratio > 2,
          math.min(16, math.max(1, math.ceil(ratio).toLong)).toInt)
      }
    assertSameRows(Relational.q88.run(spark, dir), expected)
  }
}
