package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Keys

/** Star-schema tables built from the four staging frames — the
  * `INSERT … SELECT` tier of the reference (sql_queries.py:125-258), in
  * its dependency order (sql_queries.py:281): visa → city (incl. the
  * coordinate update) → airports → temperatures → statistics →
  * travelers.
  *
  * Surrogate keys (`IDENTITY(1,1)`) are assigned with
  * [[graft.operators.Keys.scalableSurrogate]] over an explicit total
  * order — Redshift's identity order is unspecified, so a deterministic
  * order is REQUIRED for a verifiable contract (c_id/a_id are join keys
  * downstream). `p_id` is omitted entirely: no reference query reads it
  * and its order is unobservable.
  *
  * Every dimension side is broadcast — city/airports are small dims by
  * construction (distinct cities of the airport feed), the fact side
  * (travelers at 100 TB) streams through a broadcast hash join with no
  * shuffle.
  */
object StarSchema {

  case class Star(
      visaCodes: DataFrame, city: DataFrame, airports: DataFrame,
      temperatures: DataFrame, statistics: DataFrame, travelers: DataFrame)

  /** S10 static VALUES seed (sql_queries.py:134-137). */
  def visaCodes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((1, "Business"), (2, "Pleasure"), (3, "Student"))
      .toDF("v_code", "v_description")
  }

  /** City dim: the A2 distinct extraction (sql_queries.py:149-152) and
    * the J7 `UPDATE … FROM` coordinate fill (sql_queries.py:154-159)
    * folded into one pass. Redshift's update takes an arbitrary matching
    * airport's coords; `min_by(coord, iata_code)` reproduces the
    * some-row-wins contract deterministically.
    */
  def city(stAirports: DataFrame): DataFrame = {
    val grouped = stAirports
      .groupBy(col("city").as("c_name"), col("state").as("c_state_code"))
      .agg(
        min_by(col("lat"), col("iata_code")).as("c_lat"),
        min_by(col("long"), col("iata_code")).as("c_long"))
    Keys.scalableSurrogate(grouped, Seq(col("c_name"), col("c_state_code")), "c_id")
      .select("c_id", "c_name", "c_state_code", "c_lat", "c_long")
  }

  /** J3 build join (sql_queries.py:172-177) + a_id surrogate. */
  def airports(stAirports: DataFrame, city: DataFrame): DataFrame = {
    val joined = stAirports.join(broadcast(city),
      stAirports("city") === city("c_name") &&
        stAirports("state") === city("c_state_code"))
    Keys.scalableSurrogate(joined, Seq(col("iata_code"), col("name")), "a_id")
      .select(col("a_id"), col("c_id").as("a_city_id"),
        col("iata_code").as("a_iata_code"), col("type").as("a_type"),
        col("name").as("a_name"), col("elevation_ft").as("a_elevation_ft"))
  }

  /** J4 name-ONLY join (sql_queries.py:191-196) — no state in the key;
    * duplicate city names fan out, which is reference behavior.
    */
  def temperatures(stTemps: DataFrame, city: DataFrame): DataFrame =
    stTemps.join(broadcast(city), stTemps("city") === city("c_name"))
      .select(col("c_id").as("t_city_id"), col("date").as("t_date"),
        col("month").as("t_month"), col("year").as("t_year"),
        col("avg_temp").as("t_avg_temp"),
        col("avg_temp_uncertainty").as("t_avg_temp_uncertainty"),
        col("average_temp_month").as("t_average_temp_month"))

  /** J5 build join (sql_queries.py:225-237). */
  def statistics(stCities: DataFrame, city: DataFrame): DataFrame =
    stCities.join(broadcast(city),
        stCities("city") === city("c_name") &&
          stCities("state") === city("c_state_code"))
      .select(col("c_id").as("s_city_id"),
        col("population").as("s_population"),
        col("median_age").as("s_median_age"),
        col("avg_household").as("s_avg_household"),
        col("cnt_male").as("s_cnt_male"), col("per_male").as("s_per_male"),
        col("cnt_female").as("s_cnt_female"), col("per_female").as("s_per_female"),
        col("cnt_veterans").as("s_cnt_veterans"), col("per_veterans").as("s_per_veterans"),
        col("cnt_foreign_born").as("s_cnt_foreign_born"),
        col("per_foreign_born").as("s_per_foreign_born"),
        col("cnt_white").as("s_cnt_white"), col("per_white").as("s_per_white"),
        col("cnt_his_latino").as("s_cnt_his_latino"),
        col("per_his_latino").as("s_per_his_latino"),
        col("cnt_asian").as("s_cnt_asian"), col("per_asian").as("s_per_asian"),
        col("cnt_amer_ind_ak_native").as("s_cnt_amer_ind_ak_native"),
        col("per_amer_ind_ak_native").as("s_per_amer_ind_ak_native"),
        col("cnt_black").as("s_cnt_black"),
        col("per_black_afr_amer").as("s_per_black_afr_amer"))

  /** J6 fact build (sql_queries.py:253-258): fact side streams, airport
    * dim broadcast. Unmatched ports drop (F8 join-as-filter).
    */
  def travelers(stTravelers: DataFrame, airports: DataFrame): DataFrame =
    stTravelers.join(broadcast(airports),
        airports("a_iata_code") === stTravelers("iata_code"))
      .select(col("a_id").as("p_airport_id"), col("age").as("p_age"),
        col("visa").as("p_visa_code"), col("gender").as("p_gender"),
        col("year_of_birth").as("p_year_of_birth"),
        col("arrival_year").as("p_arrival_year"),
        col("arrival_month").as("p_arrival_month"),
        col("arrival_day").as("p_arrival_day"))

  /** Full dependency-ordered build from the default inputs. */
  def build(spark: SparkSession): Star = {
    val stAir = AirportsPrep.staging(spark)
    val stCities = CitiesPrep.staging(spark)
    val stTemps = TempsPrep.staging(spark)
    val stTrav = TravelersPrep.staging(spark)
    val cityDf = city(stAir)
    val airportsDf = airports(stAir, cityDf)
    Star(
      visaCodes = visaCodes(spark),
      city = cityDf,
      airports = airportsDf,
      temperatures = temperatures(stTemps, cityDf),
      statistics = statistics(stCities, cityDf),
      travelers = travelers(stTrav, airportsDf))
  }
}
