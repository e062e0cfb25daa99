package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Scd2, Scd2Join}

/** Temporal-join tests over the reference's scd2_join seed tables
  * (`integration_tests/seeds/scd2_join/`, models `customers_with_addresses`
  * etc.): single-key three-way join and composite-key join.
  */
class Scd2JoinSpec extends SparkTestBase {

  private def src(name: String, keyCols: Seq[String], payload: Map[String, String]): DataFrame = {
    val base = seed(s"scd2_join/$name.csv")
    val casts = base.columns.map {
      case "_updated_at"                => tsCol("_updated_at")
      case c if keyCols.contains(c)     => col(c).cast("int").as(c)
      case c if payload.contains(c)     => col(c).cast(payload(c)).as(c)
      case c                            => col(c)
    }
    base.select(casts.toSeq: _*)
  }

  private def dim(name: String, keys: Seq[String], payload: Map[String, String] = Map.empty): DataFrame =
    Scd2.initialLoad(src(name, keys, payload), ScdConfig(uniqueKey = keys))

  test("three-way temporal join reconstructs point-in-time state") {
    val customers = dim("customers_source", Seq("customer_id"))
    val addresses = dim("addresses_source", Seq("customer_id"))
    val ratings = dim("credit_ratings_source", Seq("customer_id"),
      Map("credit_score" -> "int"))

    val joined = Scd2Join(
      Seq("customers" -> customers.select("customer_id", "customer_name", "email", "_valid_from", "_valid_to"),
          "addresses" -> addresses.select("customer_id", "city", "state", "_valid_from", "_valid_to"),
          "ratings" -> ratings.select("customer_id", "credit_rating", "credit_score", "_valid_from", "_valid_to")),
      Seq("customer_id")).cache()

    // customer 1 changes at 01-01 (all three), 01-10 (address), 01-12
    // (rating), 01-15 (customer), 01-18 (rating) -> 5 spine segments
    val c1 = joined.filter(col("customer_id") === 1).orderBy("_valid_from").collect()
    assert(c1.length === 5)

    // at 01-12 only the rating changed; customer/address versions replicate
    val seg = c1(2)
    assert(seg.getAs[java.sql.Timestamp]("_valid_from") === ts("2024-01-12 00:00:00"))
    assert(seg.getAs[String]("customers_email") === "alice@old.com")
    assert(seg.getAs[String]("addresses_city") === "Boston")
    assert(seg.getAs[Int]("ratings_credit_score") === 780)

    // final segment is current and open-ended
    assert(c1.last.getAs[Boolean]("_is_current"))
    assert(c1.last.getAs[java.sql.Timestamp]("_valid_to") === ts("2999-12-31 23:59:59"))
    assert(c1.last.getAs[String]("customers_email") === "alice@new.com")
    assert(c1.last.getAs[String]("ratings_credit_rating") === "B")

    // spine windows are continuous per key
    val spineCfg = ScdConfig(uniqueKey = Seq("customer_id"))
    assert(ScdInvariants.continuousValidityWindows(joined, spineCfg).count() === 0)
    assert(ScdInvariants.oneCurrentPerKey(joined, spineCfg).count() === 0)
  }

  test("asOfFill == containment join on invariant-valid dims, incl NULL keys") {
    import spark.implicits._
    val customers = dim("customers_source", Seq("customer_id"))
      .select("customer_id", "customer_name", "email", "_valid_from", "_valid_to")
    val addresses = dim("addresses_source", Seq("customer_id"))
      .select("customer_id", "city", "state", "_valid_from", "_valid_to")
    // add a NULL-key version chain: the reference join's `=` never matches
    // NULL keys, so its payloads must stay NULL in both strategies
    val nullKeyRows = Scd2
      .initialLoad(
        Seq((Option.empty[Int], "ghost", "g@x", ts("2024-01-05 00:00:00")))
          .toDF("customer_id", "customer_name", "email", "_updated_at"),
        ScdConfig(uniqueKey = Seq("customer_id")))
      .select("customer_id", "customer_name", "email", "_valid_from", "_valid_to")
    val cust = customers.unionByName(nullKeyRows)

    val rels = Seq("customers" -> cust, "addresses" -> addresses)
    val viaJoin = Scd2Join(rels, Seq("customer_id"))
    val viaFill = Scd2Join.asOfFill(rels, Seq("customer_id"))
    assert(viaFill.columns.toSeq === viaJoin.columns.toSeq)
    assert(viaJoin.exceptAll(viaFill).count() === 0)
    assert(viaFill.exceptAll(viaJoin).count() === 0)
    // and the NULL-key spine rows exist with NULL payloads
    val ghost = viaFill.filter(col("customer_id").isNull).collect()
    assert(ghost.nonEmpty && ghost.forall(_.getAs[String]("customers_email") == null))
  }

  test("enrich: point-in-time fact lookup with [from, to) boundaries") {
    val session = spark
    import session.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val cfg = ScdConfig(uniqueKey = Seq("customer_id"))
    val dim = operators.Scd2.initialLoad(
      Seq((1L, "new", ts("2025-01-01 00:00:00")),
          (1L, "active", ts("2025-01-03 00:00:00")),
          (2L, "new", ts("2025-01-02 00:00:00")))
        .toDF("customer_id", "status", "_updated_at"),
      cfg)
    val facts = Seq(
      (10L, 1L, ts("2025-01-02 12:00:00")), // inside v1
      (11L, 1L, ts("2025-01-03 00:00:00")), // exactly v2's valid_from -> v2
      (12L, 1L, ts("2024-12-25 00:00:00")), // before first version -> NULL
      (13L, 9L, ts("2025-01-05 00:00:00")), // unknown key -> NULL
      (14L, 2L, ts("2025-06-01 00:00:00"))  // open tail -> current
    ).toDF("fact_id", "customer_id", "ts")
    val out = operators.Scd2Join.enrich(facts, "ts", dim,
                                        Seq("customer_id"), cfg)
      .select("fact_id", "dim_status").as[(Long, Option[String])]
      .collect().toMap
    assert(out === Map(10L -> Some("new"), 11L -> Some("active"),
                       12L -> None, 13L -> None, 14L -> Some("new")))
  }

  test("enrich == containment left-join on a generated history") {
    val session = spark
    import session.implicits._
    val cfg = ScdConfig(uniqueKey = Seq("k"))
    // deterministic pseudo-random versions: 40 keys x up to 9 versions
    val src = (0 until 400).map { i =>
      val k = i % 40
      val v = (i * 7919) % 9
      (k.toLong, s"s${(i * 104729) % 5}",
       new java.sql.Timestamp(1700000000000L + v * 86400000L + k * 1000L))
    }.distinct.toDF("k", "status", "_updated_at")
    val dim = operators.Scd2.initialLoad(src, cfg).cache()
    // facts probe between, at, before, and beyond version boundaries
    val facts = (0 until 300).map { i =>
      (i.toLong, (i % 50).toLong, // 10 keys have no dimension history
       new java.sql.Timestamp(1699990000000L + ((i * 52361L) % (10 * 86400000L))))
    }.toDF("fact_id", "k", "ts")
    val viaFill = operators.Scd2Join.enrich(facts, "ts", dim, Seq("k"), cfg)
      .select("fact_id", "dim_status")
    val viaJoin = facts
      .join(dim, facts("k") === dim("k") &&
        dim("_valid_from") <= facts("ts") && facts("ts") < dim("_valid_to"),
        "left")
      .select(facts("fact_id"), dim("status").as("dim_status"))
    assert(viaFill.exceptAll(viaJoin).count() === 0)
    assert(viaJoin.exceptAll(viaFill).count() === 0)
  }

  test("composite-key temporal join (customer_id, order_id)") {
    val keys = Seq("customer_id", "order_id")
    val orders = dim("orders_source", keys)
    val items = dim("order_items_source", keys, Map("quantity" -> "int"))

    val joined = Scd2Join(
      Seq("orders" -> orders.select("customer_id", "order_id", "order_status", "_valid_from", "_valid_to"),
          "items" -> items.select("customer_id", "order_id", "item_name", "quantity", "_valid_from", "_valid_to")),
      keys).cache()

    // order (1,100): changes at 01-02, 01-03, 01-04 (item qty), 01-05 -> 4 segments
    val o = joined
      .filter(col("customer_id") === 1 && col("order_id") === 100)
      .orderBy("_valid_from").collect()
    assert(o.length === 4)
    // 01-04 segment: status still 'processing' (01-03 version), qty now 3
    assert(o(2).getAs[String]("orders_order_status") === "processing")
    assert(o(2).getAs[Int]("items_quantity") === 3)
  }
}
