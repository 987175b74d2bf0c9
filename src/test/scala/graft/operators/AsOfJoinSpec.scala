package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks the latest click at-or-before each purchase") {
    import spark.implicits._
    val events = Seq(
      // user 1: click, click, purchase → asof = second click
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 10:05:00"), 1L, "click", 1.0, "{}"),
      (3L, ts("2024-01-01 10:07:00"), 1L, "purchase", 9.0, "{}"),
      // user 2: purchase before any click → asof = null
      (4L, ts("2024-01-01 09:00:00"), 2L, "purchase", 5.0, "{}"),
      (5L, ts("2024-01-01 09:30:00"), 2L, "click", 1.0, "{}"),
      // user 2: second purchase after the click
      (6L, ts("2024-01-01 09:45:00"), 2L, "purchase", 5.0, "{}"),
      // user 3: click at the SAME timestamp as purchase → included
      // (standard `<=` as-of; right side sorts before left at ties)
      (7L, ts("2024-01-01 08:00:00"), 3L, "click", 1.0, "{}"),
      (8L, ts("2024-01-01 08:00:00"), 3L, "purchase", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val out = Relational.asofJoin(events).collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap

    def us(s: String) = ts(s).getTime * 1000L
    assert(out(3L).contains(us("2024-01-01 10:05:00")))
    assert(out(4L).isEmpty)
    assert(out(6L).contains(us("2024-01-01 09:30:00")))
    assert(out(8L).contains(us("2024-01-01 08:00:00")))
  }

  test("as-of ignores null right timestamps and breaks ties deterministically") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00")))
      .toDF("lid", "k", "lts")
    val right = Seq(
      // null timestamp: can never satisfy rt <= lt — must NOT be matched
      (100L, 10L, null.asInstanceOf[Timestamp]),
      // two right rows at the SAME (key, time): the greatest right-value
      // struct wins, deterministically
      (101L, 10L, ts("2024-01-01 09:00:00")),
      (102L, 10L, ts("2024-01-01 09:00:00")))
      .toDF("rid", "k", "rts")
    val out = AsOf.joinAsOf(left, right, Seq("k"), "lts", "rts",
      rightValues = Seq("rid", "rts")).collect()
    assert(out.length === 1)
    val matched = out(0).getAs[Long]("asof_rid")
    assert(matched === 102L, s"expected deterministic max-struct winner, got $matched")
  }

  test("TopKAggregator equals the window top-k formulation") {
    import org.apache.spark.sql.functions.col
    val orders = graft.Tables.orders(spark, sf)
    val agg = Relational.topKPerGroupAgg(orders)
      .select(col("o_custkey"), col("rn"), col("o_orderkey")).collect()
      .map(_.toSeq).toSet
    val win = Relational.windowRank(orders)
      .select(col("o_custkey"), col("rn"), col("o_orderkey")).collect()
      .map(_.toSeq).toSet
    assert(agg === win)
  }

  test("scd2 intervals chain per user: valid_to = next valid_from, last row current") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 1.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "b", 1.0, "{}"),
      (3L, ts("2024-01-01 12:00:00"), 1L, "c", 1.0, "{}"),
      (4L, ts("2024-01-01 09:00:00"), 2L, "x", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.scd2Intervals(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5)))
    val u1 = out.filter(_._1 == 1L)
    // chained: each valid_to equals the next row's valid_from
    assert(u1.init.map(_._4.get).toSeq === u1.tail.map(_._3).toSeq)
    assert(u1.map(_._5).toSeq === Seq(false, false, true))
    assert(out.filter(_._1 == 2L).map(_._5).toSeq === Seq(true))
  }

  test("forward fill carries last value onto the 6h grid; pre-first-event is null") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 01:00:00"), 1L, "a", 5.0, "{}"),
      (2L, ts("2024-01-01 13:00:00"), 1L, "a", 7.0, "{}"),
      // user 2: single event mid-hour — its one grid point precedes it
      (3L, ts("2024-01-01 02:30:00"), 2L, "a", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.forwardFill(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
    val u1 = out.filter(_._1 == 1L).map(_._3)
    assert(u1.toSeq === Seq(Some(5.0), Some(5.0), Some(7.0))) // 01:00, 07:00, 13:00
    assert(out.filter(_._1 == 2L).map(_._3).toSeq === Seq(None)) // 02:00 < first event
  }

  test("retention cohorts count users per (first-seen day, day offset)") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 1.0, "{}"),
      (2L, ts("2024-01-02 09:00:00"), 1L, "a", 1.0, "{}"),
      (3L, ts("2024-01-04 09:00:00"), 1L, "a", 1.0, "{}"),
      (4L, ts("2024-01-02 08:00:00"), 2L, "a", 1.0, "{}"),
      (5L, ts("2024-01-02 20:00:00"), 2L, "a", 1.0, "{}"), // same day: one active row
      (6L, ts("2024-01-03 08:00:00"), 2L, "a", 1.0, "{}"),
      (7L, ts("2024-01-01 23:00:00"), 3L, "a", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.retentionCohorts(events).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 1L, 1L), ("2024-01-01", 3L, 1L),
      ("2024-01-02", 0L, 1L), ("2024-01-02", 1L, 1L)))
  }

  test("z-order interleaves bits and bounds both dims within every z range") {
    import spark.implicits._
    // x=3 (0b11), price 2500 -> y=1 (0b01): z = 1 + 2 + 4 = 7 -> range 0
    val one = Seq((3L, 2500.0)).toDF("o_custkey", "o_totalprice")
    val r = Relational.zorderLayout(one).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === ((0L, 1L, 3L, 3L, 1L, 1L)))

    // locality: stripping 12 z-bits leaves the top 2 bits of each 8-bit
    // dim -> every range spans < 64 in BOTH dimensions on the fixture
    val out = Relational.zorderLayout(graft.Tables.orders(spark, sf)).collect()
    assert(out.nonEmpty)
    assert(out.forall(row => row.getLong(3) - row.getLong(2) < 64),
      "x span leaked across a z range")
    assert(out.forall(row => row.getLong(5) - row.getLong(4) < 64),
      "y span leaked across a z range")
  }

  test("value anomalies flag >3-sigma events; degenerate users report zero") {
    import spark.implicits._
    val rows =
      (1 to 14).map(i => (i.toLong, ts(f"2024-01-01 10:$i%02d:00"), 1L, "a", 1.0, "{}")) ++
        Seq((15L, ts("2024-01-01 11:00:00"), 1L, "a", 100.0, "{}"),  // the outlier
          (16L, ts("2024-01-01 10:00:00"), 2L, "a", 5.0, "{}"),      // constant pair
          (17L, ts("2024-01-01 10:01:00"), 2L, "a", 5.0, "{}"),
          (18L, ts("2024-01-01 10:00:00"), 3L, "a", 7.0, "{}"))      // singleton
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.valueAnomalies(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 15L, 1L), (2L, 2L, 0L), (3L, 1L, 0L)))
  }

  test("event transitions count adjacent pairs per user with exact probabilities") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 1.0, "{}"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "b", 1.0, "{}"),
      (3L, ts("2024-01-01 10:02:00"), 1L, "a", 1.0, "{}"),
      (4L, ts("2024-01-01 10:03:00"), 1L, "c", 1.0, "{}"),
      (5L, ts("2024-01-01 10:00:00"), 2L, "a", 1.0, "{}"),
      (6L, ts("2024-01-01 10:05:00"), 2L, "b", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // user1: a->b, b->a, a->c; user2: a->b  =>  a->b:2, a->c:1, b->a:1
    val out = Relational.eventTransitions(events).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("a", "b", 2L, 0.666667), ("a", "c", 1L, 0.333333), ("b", "a", 1L, 1.0)))
  }

  test("basket pairs count co-occurrence once per order, including dup lines") {
    import spark.implicits._
    // order 10 lists part 2 twice: the pair (1,2) must still count once
    val li = Seq((10L, 1L), (10L, 2L), (10L, 2L), (10L, 3L), (20L, 2L), (20L, 3L))
      .toDF("l_orderkey", "l_partkey")
    val out = Relational.basketPairs(li).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((2L, 3L, 2L), (1L, 2L, 1L), (1L, 3L, 1L)))
  }

  test("TPC-H Q10 returns top returned-revenue customers in rank order") {
    val out = Relational.tpchQ10(graft.Tables.customer(spark, sf),
      graft.Tables.orders(spark, sf), graft.Tables.lineitem(spark, sf),
      graft.Tables.nation(spark, sf)).collect()
    assert(out.nonEmpty && out.length <= 20)
    val revs = out.map(_.getDouble(4))
    assert(revs.sliding(2).forall(p => p(0) >= p(1)), "revenue not descending")
  }

  test("activity streaks split on gaps and count runs exactly") {
    import spark.implicits._
    // user 1: Jan 1,2,3 + Jan 5,6 -> runs of 3 and 2; user 2: Jan 1 only
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-02 09:00:00")),
      (3L, ts("2024-01-02 20:00:00")), // same day, must not split the run
      (4L, ts("2024-01-03 09:00:00")), (5L, ts("2024-01-05 09:00:00")),
      (6L, ts("2024-01-06 09:00:00"))).map { case (id, t) => (id, t, 1L, "a", 1.0, "{}") } ++
      Seq((7L, ts("2024-01-01 09:00:00"), 2L, "a", 1.0, "{}"))
    val df = events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.activityStreaks(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 5L, 2L, 3L), (2L, 1L, 1L, 1L)))
  }

  test("ewma equals the value at the first event and blends the horizon after") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 10.0, "{}"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "a", 20.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.ewmaSmooth(events).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(out(0) === ((1L, 10.0))) // lone observation: renormalized to itself
    // second: (0.25*20 + 0.1875*10) / (0.25 + 0.1875)
    val expect = (0.25 * 20 + 0.1875 * 10) / 0.4375
    assert(math.abs(out(1)._2 - expect) < 1e-6)
  }

  test("abc classification boundaries are exact integer comparisons") {
    import spark.implicits._
    // revenues 70/20/10 cents: part 1 cum=70 -> A (70*10 <= 100*7),
    // part 2 cum=90 -> B, part 3 cum=100 -> C
    val li = Seq((1L, 0.70, 0.0), (2L, 0.20, 0.0), (3L, 0.10, 0.0))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val out = Relational.abcClassification(li).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("A", 1L, 70L), ("B", 1L, 20L), ("C", 1L, 10L)))
  }

  test("TPC-H Q7 splits revenue by trade direction and ship year") {
    import spark.implicits._
    val t96 = ts("1996-06-01 00:00:00"); val t97 = ts("1997-06-01 00:00:00")
    val lineitem = Seq(
      (1L, 10L, 100.0, 0.0, t96),  // order 1: N1 supp -> N2 cust, 1996
      (2L, 20L, 50.0, 0.0, t97),   // order 2: N2 supp -> N1 cust, 1997
      (3L, 30L, 999.0, 0.0, t96))  // order 3: N3 supp, filtered out
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    val orders = Seq((1L, 1L), (2L, 2L), (3L, 2L)).toDF("o_orderkey", "o_custkey")
    val customer = Seq((1L, 2L), (2L, 1L)).toDF("c_custkey", "c_nationkey")
    val supplier = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("s_suppkey", "s_nationkey")
    val nation = Seq((1L, "NATION_1"), (2L, "NATION_2"), (3L, "NATION_3"))
      .toDF("n_nationkey", "n_name")
    val out = Relational.tpchQ7(lineitem, orders, customer, supplier, nation)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("NATION_1", "NATION_2", 1996L, 100.0), ("NATION_2", "NATION_1", 1997L, 50.0)))
  }

  test("latest compaction keeps the newest record per key with id tiebreak") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 1.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "a", 2.0, "{}"),  // newest for (1, a)
      (3L, ts("2024-01-01 11:00:00"), 1L, "b", 3.0, "{}"),
      (4L, ts("2024-01-01 11:00:00"), 1L, "b", 4.0, "{}"),  // same ts: id wins
      (5L, ts("2024-01-01 09:00:00"), 2L, "a", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.latestCompaction(events).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq === Seq((1L, "a", 2L, 2.0), (1L, "b", 4L, 4.0), (2L, "a", 5L, 5.0)))
  }

  test("out-of-order rate counts event-time regressions in arrival order") {
    import spark.implicits._
    // arrival (event_id) order, event times: 10:00, 12:00, 11:00, 13:00
    // -> the 11:00 arrival is late (prior max 12:00): 1 of 4 = 2500bp
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 1.0, "{}"),
      (2L, ts("2024-01-01 12:00:00"), 1L, "a", 1.0, "{}"),
      (3L, ts("2024-01-01 11:00:00"), 1L, "a", 1.0, "{}"),
      (4L, ts("2024-01-01 13:00:00"), 1L, "a", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.outOfOrderRate(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 4L, 1L, 2500L)))
  }

  test("TPC-H Q18 keeps only orders above the quantity threshold") {
    import spark.implicits._
    val lineitem = ((1 to 7).map(_ => (100L, 50.0)) :+ ((200L, 50.0)))
      .toDF("l_orderkey", "l_quantity")
    val orders = Seq((100L, 1L, ts("2024-01-01 00:00:00"), 1000.0),
      (200L, 2L, ts("2024-01-02 00:00:00"), 50.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val customer = Seq((1L, "alice"), (2L, "bob")).toDF("c_custkey", "c_name")
    val out = Relational.tpchQ18(customer, orders, lineitem).collect()
    assert(out.length === 1) // 350 > 300; 50 filtered
    assert(out(0).getLong(2) === 100L && out(0).getDouble(5) === 350.0)
  }

  test("cumulative users counts each user once, at first appearance") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L), (2L, ts("2024-01-02 10:00:00"), 1L),
      (3L, ts("2024-01-01 11:00:00"), 2L), (4L, ts("2024-01-03 10:00:00"), 3L))
      .map { case (id, t, u) => (id, t, u, "a", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.cumulativeUsers(events).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("2024-01-01", 2L, 2L), ("2024-01-03", 1L, 3L)))
  }

  test("benford digit extraction goes through exact integer cents") {
    import spark.implicits._
    val orders = Seq(123.45, 9.99, 50.0, 100.0).map(Tuple1(_)).toDF("o_totalprice")
    val out = Relational.benfordDigits(orders).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 12345->1, 999->9, 5000->5, 10000->1
    assert(out.toSeq === Seq((1L, 2L, 5000L), (5L, 1L, 2500L), (9L, 1L, 2500L)))
  }

  test("weekday profile uses ISO weekday numbering (2024-01-01 is a Monday)") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 05:00:00"), 1L, "a", 1.0, "{}"),   // Monday
      (2L, ts("2024-01-07 23:00:00"), 1L, "a", 2.0, "{}"))   // Sunday
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = Relational.weekdayProfile(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 5L, 1L), (7L, 23L, 1L)))
  }

  test("session/tumbling/topk sanity on fixtures") {
    val orders = graft.Tables.orders(spark, sf)
    assert(Relational.topK(orders, 5).count() === 5)
    val ranked = Relational.windowRank(orders)
    assert(ranked.filter(ranked("rn") > 3).isEmpty)
  }

  test("TPC-H Q4 counts each late order once, inside the quarter only") {
    import spark.implicits._
    val orders = Seq(
      (100L, 1L, ts("1995-02-01 00:00:00"), "1-URGENT"),  // late twice → 1
      (101L, 1L, ts("1995-02-01 00:00:00"), "1-URGENT"),  // same-day ship: not late
      (102L, 2L, ts("1996-01-01 00:00:00"), "2-HIGH"))    // late, but out of quarter
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val lineitem = Seq(
      (100L, ts("1995-03-01 00:00:00")), (100L, ts("1995-03-02 00:00:00")),
      (101L, ts("1995-02-01 00:00:00")), (102L, ts("1996-02-01 00:00:00")))
      .toDF("l_orderkey", "l_shipdate")
    val out = Relational.tpchQ4(orders, lineitem).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("1-URGENT", 1L)))
  }

  test("order-count distribution keeps zero-order customers") {
    import spark.implicits._
    val customer = Seq(1L, 2L, 3L).toDF("c_custkey")
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("o_orderkey", "o_custkey")
    val out = Relational.orderCountDistribution(customer, orders).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // all custdist = 1 → ordered by c_count desc
    assert(out.toSeq === Seq((2L, 1L), (1L, 1L), (0L, 1L)))
  }

  test("TPC-H Q19 matches each (brand, size, quantity) branch independently") {
    import spark.implicits._
    val part = Seq((10L, "Brand#12", 3), (11L, "Brand#23", 8), (12L, "Brand#12", 20))
      .toDF("p_partkey", "p_brand", "p_size")
    val lineitem = Seq(
      (10L, 5.0, 100.0, 0.1),   // branch 1: revenue 90
      (11L, 15.0, 200.0, 0.0),  // branch 2: revenue 200
      (10L, 20.0, 100.0, 0.0),  // quantity outside branch 1
      (12L, 5.0, 100.0, 0.0))   // size outside every branch
      .toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val out = Relational.tpchQ19(lineitem, part).collect()
    assert(out(0).getLong(0) === 2L && out(0).getDouble(1) === 290.0)
  }

  test("ordered string agg emits sorted, run-stable member lists") {
    import spark.implicits._
    val customer = Seq(
      (1L, 10L, "BUILDING"), (2L, 2L, "BUILDING"), (3L, 10L, "BUILDING"),
      (4L, 1L, "AUTO"))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
    val out = Relational.orderedStringAgg(customer).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // lexicographic on the string form: "10" < "2"
    assert(out.toSeq === Seq(("AUTO", 1L, "1"), ("BUILDING", 3L, "10,2")))
  }

  test("inactive-high-balance excludes boundary balances and recent orderers") {
    import spark.implicits._
    val customer = Seq(
      (1L, 1L, 100.0),   // below threshold
      (2L, 1L, 300.0),   // AT threshold (32500 cents): excluded — strict >
      (3L, 2L, 500.0),   // above, only an old order → kept
      (4L, 1L, -50.0),   // negative: out of the average, below threshold
      (5L, 2L, 400.0))   // above, but ordered recently → anti-joined away
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
    // positive-balance mean: (10000+30000+50000+40000)/4 = 32500 cents
    val orders = Seq(
      (20L, 3L, ts("2000-12-31 00:00:00")),
      (21L, 5L, ts("2001-02-01 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val out = Relational.inactiveHighBalance(customer, orders).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((2L, 1L, 50000L)))
  }
}
