package graft

import org.apache.spark.sql.functions._
import graft.pipeline._

/** Golden end-to-end pipeline run over the reference fixtures
  * (SURVEY §5.2 item 2): the 10 validation counts with ASSERTED expected
  * values (the reference only eyeballs them, etl.py:39), plus content
  * spot-checks for the trickiest rules.
  */
class PipelineSpec extends SparkSpec {

  test("validation counts match golden values") {
    val counts = Pipeline.validationCounts(spark)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = Map(
      "staging_airports" -> 42L, "staging_cities" -> 531L,
      "staging_temperatures" -> 798L, "staging_travelers" -> 859L,
      "visa_codes" -> 3L, "city" -> 39L, "airports" -> 42L,
      "temperatures" -> 819L, "statistics" -> 36L, "travelers" -> 772L)
    assert(counts == expected)
  }

  test("hemisphere formatting covers all four branches") {
    val air = AirportsPrep.staging(spark)
      .select("iata_code", "lat", "long")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(air("AGA") == (("13.48N", "144.8E")))  // east longitude
    assert(air("PPG") == (("14.33S", "170.71W"))) // southern latitude
    assert(air("CHI") == (("41.97N", "87.91W")))  // mainland N/W
  }

  test("city coordinate update is first-wins by iata (J7 contract)") {
    // Chicago has two airports (CHI O'Hare, MDW Midway): min iata CHI wins
    val chi = StarSchema.build(spark).city
      .filter(col("c_name") === "Chicago").collect().head
    assert(chi.getString(3) == "41.97N" && chi.getString(4) == "87.91W")
  }

  test("five-race pivot drops incomplete cities (inner-merge semantics)") {
    val st = CitiesPrep.staging(spark)
    assert(st.filter(col("city") === "Fort Myers").count() == 0) // 4 races only
    assert(st.filter(col("city") === "Chicago").count() == 1)
  }

  test("temperatures join is name-only: Albany fans out to NY and GA") {
    val star = StarSchema.build(spark)
    val albanyIds = star.city.filter(col("c_name") === "Albany")
      .select("c_id").collect().map(_.getLong(0)).toSet
    assert(albanyIds.size == 2)
    val april = star.temperatures
      .filter(col("t_year") === 2013 && col("t_month") === 4)
      .filter(col("t_city_id").isin(albanyIds.toSeq: _*))
    assert(april.count() == 2) // one fixture row, two city matches
  }

  test("Q3 golden top rows (warm-destination share)") {
    val top = Analytics.q3(StarSchema.build(spark))
      .limit(3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(4)))
    assert(top.toSeq == Seq(
      ("New York", "NY", 15.41), ("Miami", "FL", 12.69), ("Los Angeles", "CA", 11.66)))
  }

  test("Q1 ordering follows median age desc") {
    val q1 = Analytics.q1(StarSchema.build(spark)).collect()
    assert(q1.length == 34)
    val medians = q1.map(_.getDouble(1)).toSeq
    assert(medians == medians.sorted.reverse)
    assert(q1.head.getString(2) == "Fort Lauderdale")
  }

  test("pipeline runner materializes all stages ok") {
    val out = s"${sys.props("java.io.tmpdir")}/graft_test_pipeline"
    val results = Pipeline.run(spark, out)
    assert(results.forall(_.ok), results.filterNot(_.ok).mkString(","))
    assert(results.map(r => r.name -> r.rows).toMap.apply("travelers") == 772L)
    // travelers lands partitioned by arrival year/month (README.md:23,156)
    val dirs = new java.io.File(s"$out/travelers").listFiles().map(_.getName)
    assert(dirs.exists(_.startsWith("p_arrival_year=2016")), dirs.mkString(","))
    val april = spark.read.parquet(s"$out/travelers")
      .filter(col("p_arrival_year") === 2016 && col("p_arrival_month") === 4)
    assert(april.count() > 0)
  }
}
