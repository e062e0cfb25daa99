package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Scd01

/** Golden-output tests for SCD types 0/1 against the reference's expected
  * seeds (`seeds/scd_materialization/customers_scd{0,1}_expected_{1,2}.csv`),
  * compared via symmetric EXCEPT like `test_matches_expected_seed.sql:11-37`.
  */
class Scd01GoldenSpec extends SparkTestBase {

  private val GoldenCols = Seq("customer_id", "customer_name", "email", "status", "_valid_from")

  private def golden(name: String): DataFrame =
    seed(s"scd_materialization/$name.csv")
      .select(col("customer_id").cast("int"), col("customer_name"),
              col("email"), col("status"), tsCol("_valid_from"))

  private def cfg(t: Int) = ScdConfig(
    uniqueKey = Seq("customer_id"),
    scdType = t,
    createdAtCol = Some("_created_at"))

  private def assertMatchesGolden(actual: DataFrame, goldenName: String): Unit = {
    val diff = ScdInvariants
      .matchesExpected(actual.select(GoldenCols.map(col): _*), golden(goldenName))
      .collect()
    assert(diff.isEmpty, s"golden mismatch for $goldenName:\n${diff.mkString("\n")}")
  }

  test("scd1: latest wins, first-seen _valid_from preserved across merges") {
    val t1 = Scd01.initialLoad(customersScd01Model(1), cfg(1)).cache()
    assertMatchesGolden(t1, "customers_scd1_expected_1")
    assert(ScdInvariants.allRecordsCurrent(t1, cfg(1)).count() === 0)

    val t2 = Scd01.incremental(t1, customersScd01Model(2), cfg(1)).cache()
    assertMatchesGolden(t2, "customers_scd1_expected_2")
    assert(ScdInvariants.allRecordsCurrent(t2, cfg(1)).count() === 0)
  }

  test("scd0: original values retained forever") {
    val t1 = Scd01.initialLoad(customersScd01Model(1), cfg(0)).cache()
    assertMatchesGolden(t1, "customers_scd0_expected_1")

    val t2 = Scd01.incremental(t1, customersScd01Model(2), cfg(0)).cache()
    assertMatchesGolden(t2, "customers_scd0_expected_2")
    assert(ScdInvariants.allRecordsCurrent(t2, cfg(0)).count() === 0)
  }

  test("scd types 0/1 reject deleted_at configuration") {
    val bad = cfg(1).copy(deletedAtCol = Some("deleted_at"))
    val e = intercept[IllegalArgumentException] {
      Scd01.initialLoad(customersScd01Model(1), bad)
    }
    assert(e.getMessage.contains("deletion tracking is not supported"))
  }

  test("scd type 3 rejected at validation") {
    val e = intercept[IllegalArgumentException] {
      ScdConfig(uniqueKey = Seq("customer_id"), scdType = 3).validate()
    }
    assert(e.getMessage.contains("must be 0, 1 or 2"))
  }
}
