package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** The four cleaning stages of the reference pipeline (dataprep.py:11-232),
  * re-expressed as declarative DataFrame transforms. Each returns the
  * staging-table layout of sql_queries.py:23-89.
  *
  * Numeric note: the reference rounds with pandas/numpy (half-to-even);
  * Spark `round` is HALF_UP, matching the DuckDB oracle and Spark SQL —
  * observable only on exact .xx5 ties, which the inputs don't contain.
  */
object CitiesPrep {

  /** Race list and loop order from dataprep.py:16. */
  val Races: Seq[String] = Seq("White", "Hispanic or Latino", "Asian",
    "American Indian and Alaska Native", "Black or African-American")

  /** (race → (cnt column, per column)) renames from dataprep.py:69-92. */
  val RaceCols: Seq[(String, (String, String))] = Seq(
    "White" -> (("cnt_white", "per_white")),
    "Hispanic or Latino" -> (("cnt_his_latino", "per_his_latino")),
    "Asian" -> (("cnt_asian", "per_asian")),
    "American Indian and Alaska Native" ->
      (("cnt_amer_ind_ak_native", "per_amer_ind_ak_native")),
    "Black or African-American" -> (("cnt_black", "per_black_afr_amer")))

  /** Base demographic columns, in the tie-break order used by the
    * keep-first dedup below (City/State excluded — they're the key).
    */
  val BaseCols: Seq[String] = Seq(
    "Median Age", "Male Population", "Female Population",
    "Total Population", "Number of Veterans", "Foreign-born",
    "Average Household Size", "State Code")

  /** dataprep.py:11-95 — the 5 race self-merges collapse into ONE pivot
    * (SURVEY W2): per-(City, State) race counts pivoted wide, joined to
    * ONE base row per (City, State). A city missing any of the 5 races
    * pivots to null and is filtered — identical to the reference's inner
    * merges dropping it.
    *
    * Duplicate contract (A7, dataprep.py:40): the reference dedups with
    * `drop_duplicates(subset=["City","State"])`, keeping the FIRST row —
    * under conflicting duplicates "first" in pandas depends on file
    * order filtered through a non-stable quicksort, so it is not a
    * reproducible cross-engine spec. This pins the same keep-ONE-row
    * semantics deterministically: the lexicographically smallest base
    * tuple wins (row_number over [[BaseCols]], nulls first), and
    * duplicate race rows resolve to min(Count). Where duplicates don't
    * conflict — every row of the reference's own data — this is exactly
    * pandas' result.
    */
  def staging(spark: SparkSession, path: String = Schemas.citiesCsv): DataFrame = {
    val raw = spark.read.option("sep", ";").option("header", "true")
      .schema(Schemas.rawCities).csv(path)
    val wFirst = Window.partitionBy(col("City"), col("State"))
      .orderBy(BaseCols.map(c => col(s"`$c`").asc_nulls_first): _*)
    val base = raw
      .select((Seq("City", "State") ++ BaseCols).map(c => col(s"`$c`")): _*)
      .withColumn("__rn", row_number().over(wFirst))
      .filter(col("__rn") === 1).drop("__rn")
    val races = raw.groupBy(col("City"), col("State"))
      .pivot("Race", Races).agg(min(col("Count")))
    // base is already hash-partitioned by the window's (City, State) key,
    // so this equi-join reuses that exchange
    val pivoted = base.join(races, Seq("City", "State"))
    val complete = pivoted.filter(
      Races.map(r => col(s"`$r`").isNotNull).reduce(_ && _))
    val pop = col("Total Population")
    val raceOut = RaceCols.flatMap { case (race, (cnt, per)) =>
      Seq(col(s"`$race`").as(cnt), round(col(s"`$race`") / pop, 2).as(per))
    }
    // staging_cities column layout, sql_queries.py:49-75
    complete.select(Seq(
      col("City").as("city"),
      col("Median Age").as("median_age"),
      col("Male Population").as("cnt_male"),
      col("Female Population").as("cnt_female"),
      pop.as("population"),
      col("Number of Veterans").as("cnt_veterans"),
      col("Foreign-born").as("cnt_foreign_born"),
      col("Average Household Size").as("avg_household"),
      col("State Code").as("state")) ++ raceOut ++ Seq(
      round(col("Male Population") / pop, 2).as("per_male"),
      round(col("Female Population") / pop, 2).as("per_female"),
      round(col("Number of Veterans") / pop, 2).as("per_veterans"),
      round(col("Foreign-born") / pop, 2).as("per_foreign_born")): _*)
  }
}

object AirportsPrep {

  /** Sign-dependent hemisphere formatting with built-ins only (X2/U2 —
    * the reference's row lambdas at dataprep.py:144-145, no UDF).
    */
  def hemisphere(c: Column, neg: String, pos: String): Column =
    when(c < 0, concat(abs(c).cast(StringType), lit(neg)))
      .otherwise(concat(c.cast(StringType), lit(pos)))

  /** dataprep.py:97-148: iata cleaning filters (F2/F3), 9-col projection
    * (P1), coordinate split — the raw field is "long, lat" (X1,
    * dataprep.py:114) — US filter (F4), region→state split, round-then-
    * format hemisphere strings. The dead sort at dataprep.py:108 is
    * omitted (no-op; SURVEY O3).
    */
  def staging(spark: SparkSession, path: String = Schemas.airportsCsv): DataFrame = {
    val raw = spark.read.option("header", "true")
      .schema(Schemas.rawAirports).csv(path)
    raw
      .filter(col("iata_code").isNotNull)
      .filter(col("iata_code") =!= "0")
      .filter(col("iata_code") =!= "-")
      .select("iata_code", "type", "name", "elevation_ft", "continent",
        "iso_country", "iso_region", "municipality", "coordinates")
      .withColumn("long", split(col("coordinates"), ",").getItem(0).cast(DoubleType))
      .withColumn("lat", split(col("coordinates"), ",").getItem(1).cast(DoubleType))
      .drop("coordinates")
      .filter(col("iso_country") === "US")
      .withColumn("state", split(col("iso_region"), "-").getItem(1))
      .drop("continent", "iso_country", "iso_region")
      .withColumnRenamed("municipality", "city")
      // staging_airports layout, sql_queries.py:36-47
      .select(
        col("iata_code"), col("type"), col("name"), col("elevation_ft"),
        col("city"),
        hemisphere(round(col("long"), 2), "W", "E").as("long"),
        hemisphere(round(col("lat"), 2), "S", "N").as("lat"),
        col("state"))
  }
}

object TempsPrep {

  /** dataprep.py:150-190: month/year extraction (X5), dropna (F5), US
    * filter (F4), and the groupby-mean + left-merge-back
    * (dataprep.py:181-184) collapsed into ONE window aggregate over
    * (city, month) — identical result (the merge key is the full
    * grouping key), one shuffle instead of two (SURVEY W1).
    */
  def staging(spark: SparkSession, path: String = Schemas.temperaturesCsv): DataFrame = {
    val raw = spark.read.option("header", "true")
      .schema(Schemas.rawTemperatures).csv(path)
    val cleaned = raw
      .withColumn("month", month(to_date(col("dt"))))
      .withColumn("year", year(to_date(col("dt"))))
      .na.drop("any")
      .filter(col("Country") === "United States")
      .drop("Country")
    val w = Window.partitionBy(col("City"), col("month"))
    // staging_temperatures layout, sql_queries.py:77-89; rounds applied
    // AFTER the group average, over the unrounded detail (dataprep order)
    cleaned.select(
      col("dt").as("date"),
      round(col("AverageTemperature"), 2).as("avg_temp"),
      round(col("AverageTemperatureUncertainty"), 2).as("avg_temp_uncertainty"),
      col("City").as("city"),
      col("Latitude").as("lat"),
      col("Longitude").as("long"),
      col("month"), col("year"),
      round(avg(col("AverageTemperature")).over(w), 2).as("average_temp_month"))
  }
}

object TravelersPrep {

  /** dataprep.py:192-232: the S4 scan contract (28 raw I-94 columns in,
    * 6 projected out via selectExpr P6), bad-port filter (F3), SAS epoch
    * date decode with a null-propagating built-in instead of the
    * reference's Python UDF (X3/U1, dataprep.py:210-212), date_format
    * part extraction (X4), gender null filter (F6), final casts (P5).
    */
  def staging(spark: SparkSession, path: String = Schemas.travelersCsv): DataFrame = {
    val raw = spark.read.option("header", "true")
      .schema(Schemas.rawI94).csv(path)
    raw.selectExpr("i94port as iata_code", "arrdate as arrival_date",
        "i94bir as age", "i94visa as visa", "biryear as year_of_birth", "gender")
      .filter(col("iata_code") =!= "XXX")
      .withColumn("arrival_date",
        date_add(to_date(lit("1960-01-01")), col("arrival_date").cast(IntegerType)))
      .withColumn("arrival_year", date_format(col("arrival_date"), "y"))
      .withColumn("arrival_month", date_format(col("arrival_date"), "M"))
      .withColumn("arrival_day", date_format(col("arrival_date"), "d"))
      .drop("arrival_date")
      .filter(col("gender").isNotNull)
      // staging_travelers layout, sql_queries.py:23-34
      .selectExpr("iata_code", "cast(age as int) as age",
        "cast(visa as int) as visa", "gender",
        "cast(year_of_birth as int) as year_of_birth",
        "cast(arrival_year as int) as arrival_year",
        "cast(arrival_month as int) as arrival_month",
        "cast(arrival_day as int) as arrival_day")
  }
}
