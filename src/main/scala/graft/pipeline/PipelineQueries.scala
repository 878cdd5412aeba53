package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract glue for the reference pipeline: one CORRECTNESS
  * entry per staging table, per star table, the 10 validation counts,
  * and README Q1-Q3. The `sfDir` argument is ignored — this tier runs
  * over the reference's own fixture inputs (Schemas paths), which is the
  * point: the engine executes the reference's actual workload.
  *
  * The DuckDB oracles rebuild the ENTIRE pipeline in SQL from the same
  * raw CSVs (read_csv + CTEs), so every prep rule, join contract,
  * surrogate-key assignment, and README query is independently
  * cross-checked end to end.
  */
object PipelineQueries {

  // ---------------------------------------------------------- Spark side

  /** Staging + star frames, built once per session and persisted — the
    * honest execution model (a real pipeline materializes staging once;
    * queries run over the materialized tables), and it keeps 13 driver
    * queries from re-running the CSV preps 13 times. Held in
    * [[graft.SessionCache]] — released when the owning main calls
    * `SessionCache.clear(session)` at shutdown (see its retention
    * contract; the frames are NOT freed implicitly).
    */
  private def built(s: SparkSession): (Pipeline.Staging, StarSchema.Star) =
    graft.SessionCache.memo(s, "pipeline") {
      val stg = Pipeline.Staging(
        airports = AirportsPrep.staging(s).persist(),
        cities = CitiesPrep.staging(s).persist(),
        temperatures = TempsPrep.staging(s).persist(),
        travelers = TravelersPrep.staging(s).persist())
      val cityDf = StarSchema.city(stg.airports).persist()
      val airportsDf = StarSchema.airports(stg.airports, cityDf).persist()
      val star = StarSchema.Star(
        visaCodes = StarSchema.visaCodes(s),
        city = cityDf,
        airports = airportsDf,
        temperatures = StarSchema.temperatures(stg.temperatures, cityDf).persist(),
        statistics = StarSchema.statistics(stg.cities, cityDf).persist(),
        travelers = StarSchema.travelers(stg.travelers, airportsDf).persist())
      (stg, star)
    }

  private def stg(s: SparkSession): Pipeline.Staging = built(s)._1
  private def star(s: SparkSession): StarSchema.Star = built(s)._2

  /** p14: the PARTITIONED star — `travelers` written partitioned by
    * (p_arrival_year, p_arrival_month), the layout SURVEY §4 / the
    * reference README wish for ("partition by month"), then Q1 re-run
    * against the partitioned fact restricted to one month. The month
    * filter lives on a month-DIM side of a join (a scanned parquet
    * relation — a VALUES dim would constant-fold away before the DPP
    * rule), so Catalyst injects a dynamic-partition-pruning subquery and
    * the fact scan reads only the matching year/month directories —
    * PlanSpec asserts the pruning filter. At 100 TB this is THE star
    * access path: a month of fact files read, the rest never listed.
    * Built once per session; the write itself is part of the operator
    * (the reference's INSERT…SELECT tier materializes the same table).
    */
  def partitionedQ1(s: SparkSession): DataFrame = {
    val (factPath, dimPath) = graft.SessionCache.memo(s, "p14paths") {
      val base = s"${sys.props("java.io.tmpdir")}/graft_star_part_${graft.Fs.tmpTag("pipeline")}"
      star(s).travelers.write.mode("overwrite")
        .partitionBy("p_arrival_year", "p_arrival_month").parquet(base)
      val dim = s"${base}_dim"
      // the pruning filter must be a LITERAL equality — Catalyst's DPP
      // rule only fires behind a "likely selective" dim predicate
      s.range(1, 13)
        .select(lit(2016).as("d_year"), col("id").cast("int").as("d_month"),
          when(col("id") === 4, "target").otherwise("other").as("d_label"))
        .coalesce(1).write.mode("overwrite").parquet(dim)
      (base, dim)
    }
    val fact = s.read.parquet(factPath)
    val monthDim = s.read.parquet(dimPath).filter(col("d_label") === "target")
    val st = star(s)
    val averages = fact
      .join(monthDim, col("p_arrival_year") === col("d_year") &&
        col("p_arrival_month") === col("d_month"))
      .join(broadcast(st.airports), col("p_airport_id") === col("a_id"))
      .join(broadcast(st.city), col("a_city_id") === col("c_id"))
      .groupBy(col("a_city_id"))
      .agg(avg(col("p_age")).as("avg_age"))
      .select(col("avg_age"), col("a_city_id").as("age_city_id"))
    averages
      .join(broadcast(st.city), col("c_id") === col("age_city_id"))
      .join(broadcast(st.statistics), col("s_city_id") === col("c_id"))
      .select(col("avg_age"), col("s_median_age"), col("c_name"), col("c_state_code"))
      .orderBy(col("s_median_age").desc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_cities_prep" -> ((s: SparkSession, _: String) => stg(s).cities),
    "p02_airports_prep" -> ((s: SparkSession, _: String) => stg(s).airports),
    "p03_temps_prep" -> ((s: SparkSession, _: String) => stg(s).temperatures),
    "p04_travelers_prep" -> ((s: SparkSession, _: String) => stg(s).travelers),
    "p05_star_city" -> ((s: SparkSession, _: String) => star(s).city),
    "p06_star_airports" -> ((s: SparkSession, _: String) => star(s).airports),
    "p07_star_temperatures" -> ((s: SparkSession, _: String) => star(s).temperatures),
    "p08_star_statistics" -> ((s: SparkSession, _: String) => star(s).statistics),
    "p09_star_travelers" -> ((s: SparkSession, _: String) => star(s).travelers),
    "p10_validation_counts" -> ((s: SparkSession, _: String) =>
      Pipeline.validationCounts(s, Some(built(s)))),
    "p11_q1" -> ((s: SparkSession, _: String) => Analytics.q1(star(s))),
    "p12_q2" -> ((s: SparkSession, _: String) => Analytics.q2(star(s))),
    "p13_q3" -> ((s: SparkSession, _: String) => Analytics.q3(star(s))),
    "p14_partitioned_q1" -> ((s: SparkSession, _: String) => partitionedQ1(s)))

  // --------------------------------------------------- DuckDB oracle SQL

  private def hemiSql(idx: Int, neg: String, pos: String): String = {
    val v = s"ROUND(CAST(trim(string_split(coordinates, ',')[$idx]) AS DOUBLE), 2)"
    s"CASE WHEN $v < 0 THEN CAST(ABS($v) AS VARCHAR) || '$neg' ELSE CAST($v AS VARCHAR) || '$pos' END"
  }

  private def raceMin(race: String): String =
    s"""min(CASE WHEN "Race" = '$race' THEN "Count" END)"""

  /** Replicates CitiesPrep's deterministic keep-first contract (see its
    * scaladoc): one base row per (City, State) chosen by row_number over
    * the base columns (ASC NULLS FIRST — Spark's asc_nulls_first), race
    * counts as min per race, completeness filter on all five races.
    */
  private val stCitiesSql: String = {
    val raceCols = CitiesPrep.RaceCols.map { case (_, (cnt, per)) =>
      s"""  r.$cnt AS $cnt,
         |  ROUND(CAST(r.$cnt AS DOUBLE) / b."Total Population", 2) AS $per""".stripMargin
    }.mkString(",\n")
    val raceAgg = CitiesPrep.RaceCols.map { case (race, (cnt, _)) =>
      s"${raceMin(race)} AS $cnt"
    }.mkString(",\n        ")
    val notNull = CitiesPrep.RaceCols.map { case (_, (cnt, _)) =>
      s"r.$cnt IS NOT NULL"
    }.mkString(" AND ")
    val ordering = CitiesPrep.BaseCols
      .map(c => s""""$c" ASC NULLS FIRST""").mkString(", ")
    s"""st_cities AS (
       | SELECT b."City" AS city,
       |  b."Median Age" AS median_age,
       |  b."Male Population" AS cnt_male,
       |  b."Female Population" AS cnt_female,
       |  b."Total Population" AS population,
       |  b."Number of Veterans" AS cnt_veterans,
       |  b."Foreign-born" AS cnt_foreign_born,
       |  b."Average Household Size" AS avg_household,
       |  b."State Code" AS state,
       |$raceCols,
       |  ROUND(CAST(b."Male Population" AS DOUBLE) / b."Total Population", 2) AS per_male,
       |  ROUND(CAST(b."Female Population" AS DOUBLE) / b."Total Population", 2) AS per_female,
       |  ROUND(CAST(b."Number of Veterans" AS DOUBLE) / b."Total Population", 2) AS per_veterans,
       |  ROUND(CAST(b."Foreign-born" AS DOUBLE) / b."Total Population", 2) AS per_foreign_born
       | FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY "City", "State"
       |         ORDER BY $ordering) AS rn
       |       FROM read_csv('${Schemas.citiesCsv}', delim=';', header=true)) b
       | JOIN (SELECT "City", "State",
       |        $raceAgg
       |       FROM read_csv('${Schemas.citiesCsv}', delim=';', header=true)
       |       GROUP BY "City", "State") r
       |   ON b."City" = r."City" AND b."State" = r."State"
       | WHERE b.rn = 1 AND $notNull
       |)""".stripMargin
  }

  private val stAirSql: String =
    s"""st_air AS (
       | SELECT iata_code, type, name, elevation_ft, municipality AS city,
       |  ${hemiSql(1, "W", "E")} AS long,
       |  ${hemiSql(2, "S", "N")} AS lat,
       |  string_split(iso_region, '-')[2] AS state
       | FROM read_csv('${Schemas.airportsCsv}', header=true)
       | WHERE iata_code IS NOT NULL AND iata_code <> '0' AND iata_code <> '-'
       |   AND iso_country = 'US'
       |)""".stripMargin

  private val stTempSql: String =
    s"""st_temp AS (
       | SELECT dt AS date,
       |  ROUND(AverageTemperature, 2) AS avg_temp,
       |  ROUND(AverageTemperatureUncertainty, 2) AS avg_temp_uncertainty,
       |  City AS city, Latitude AS lat, Longitude AS long,
       |  CAST(month(CAST(dt AS DATE)) AS INTEGER) AS month,
       |  CAST(year(CAST(dt AS DATE)) AS INTEGER) AS year,
       |  ROUND(AVG(AverageTemperature) OVER (PARTITION BY City, month(CAST(dt AS DATE))), 2) AS average_temp_month
       | FROM read_csv('${Schemas.temperaturesCsv}', header=true, types={'dt': 'VARCHAR'})
       | WHERE dt IS NOT NULL AND AverageTemperature IS NOT NULL
       |   AND AverageTemperatureUncertainty IS NOT NULL AND City IS NOT NULL
       |   AND Country IS NOT NULL AND Latitude IS NOT NULL AND Longitude IS NOT NULL
       |   AND Country = 'United States'
       |)""".stripMargin

  private val i94Columns: String = Schemas.rawI94.fields.map { f =>
    val t = f.dataType.typeName match {
      case "long" => "BIGINT"
      case "double" => "DOUBLE"
      case _ => "VARCHAR"
    }
    s"'${f.name}': '$t'"
  }.mkString("{", ", ", "}")

  private val stTravSql: String = {
    val sasDate = "DATE '1960-01-01' + CAST(arrdate AS INTEGER)"
    s"""st_trav AS (
       | SELECT i94port AS iata_code,
       |  CAST(i94bir AS INTEGER) AS age,
       |  CAST(i94visa AS INTEGER) AS visa,
       |  gender,
       |  CAST(biryear AS INTEGER) AS year_of_birth,
       |  CAST(year($sasDate) AS INTEGER) AS arrival_year,
       |  CAST(month($sasDate) AS INTEGER) AS arrival_month,
       |  CAST(day($sasDate) AS INTEGER) AS arrival_day
       | FROM read_csv('${Schemas.travelersCsv}', header=false, skip=1, columns=$i94Columns)
       | WHERE i94port <> 'XXX' AND gender IS NOT NULL
       |)""".stripMargin
  }

  private val starSql: String =
    s"""city AS (
       | SELECT CAST(ROW_NUMBER() OVER (ORDER BY c_name, c_state_code) AS BIGINT) AS c_id,
       |   c_name, c_state_code, c_lat, c_long
       | FROM (SELECT city AS c_name, state AS c_state_code,
       |        arg_min(lat, iata_code) AS c_lat, arg_min(long, iata_code) AS c_long
       |       FROM st_air GROUP BY city, state) g
       |),
       |airports AS (
       | SELECT CAST(ROW_NUMBER() OVER (ORDER BY sa.iata_code, sa.name) AS BIGINT) AS a_id,
       |   c.c_id AS a_city_id, sa.iata_code AS a_iata_code, sa.type AS a_type,
       |   sa.name AS a_name, sa.elevation_ft AS a_elevation_ft
       | FROM st_air sa JOIN city c ON sa.city = c.c_name AND sa.state = c.c_state_code
       |),
       |temperatures AS (
       | SELECT c.c_id AS t_city_id, st.date AS t_date, st.month AS t_month,
       |   st.year AS t_year, st.avg_temp AS t_avg_temp,
       |   st.avg_temp_uncertainty AS t_avg_temp_uncertainty,
       |   st.average_temp_month AS t_average_temp_month
       | FROM st_temp st JOIN city c ON st.city = c.c_name
       |),
       |statistics AS (
       | SELECT c.c_id AS s_city_id, population AS s_population,
       |   median_age AS s_median_age, avg_household AS s_avg_household,
       |   cnt_male AS s_cnt_male, per_male AS s_per_male,
       |   cnt_female AS s_cnt_female, per_female AS s_per_female,
       |   cnt_veterans AS s_cnt_veterans, per_veterans AS s_per_veterans,
       |   cnt_foreign_born AS s_cnt_foreign_born, per_foreign_born AS s_per_foreign_born,
       |   cnt_white AS s_cnt_white, per_white AS s_per_white,
       |   cnt_his_latino AS s_cnt_his_latino, per_his_latino AS s_per_his_latino,
       |   cnt_asian AS s_cnt_asian, per_asian AS s_per_asian,
       |   cnt_amer_ind_ak_native AS s_cnt_amer_ind_ak_native,
       |   per_amer_ind_ak_native AS s_per_amer_ind_ak_native,
       |   cnt_black AS s_cnt_black, per_black_afr_amer AS s_per_black_afr_amer
       | FROM st_cities sc JOIN city c ON sc.city = c.c_name AND sc.state = c.c_state_code
       |),
       |visa_codes AS (
       | SELECT * FROM (VALUES (1, 'Business'), (2, 'Pleasure'), (3, 'Student')) AS v(v_code, v_description)
       |),
       |travelers AS (
       | SELECT a_id AS p_airport_id, age AS p_age, visa AS p_visa_code,
       |   gender AS p_gender, year_of_birth AS p_year_of_birth,
       |   arrival_year AS p_arrival_year, arrival_month AS p_arrival_month,
       |   arrival_day AS p_arrival_day
       | FROM st_trav st JOIN airports ON a_iata_code = st.iata_code
       |)""".stripMargin

  private val prelude: String =
    s"WITH $stCitiesSql,\n$stAirSql,\n$stTempSql,\n$stTravSql,\n$starSql"

  private def withPrelude(q: String): String = s"$prelude\n$q"

  private val perCityCnt: String =
    """SELECT c_id, count(*) AS cnt FROM travelers
      | JOIN airports ON p_airport_id = a_id
      | JOIN city ON a_city_id = c_id
      | JOIN statistics ON s_city_id = c_id
      | GROUP BY c_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "p01_cities_prep" -> withPrelude("SELECT * FROM st_cities"),
    "p02_airports_prep" -> withPrelude("SELECT * FROM st_air"),
    "p03_temps_prep" -> withPrelude("SELECT * FROM st_temp"),
    "p04_travelers_prep" -> withPrelude("SELECT * FROM st_trav"),
    "p05_star_city" -> withPrelude("SELECT * FROM city"),
    "p06_star_airports" -> withPrelude("SELECT * FROM airports"),
    "p07_star_temperatures" -> withPrelude("SELECT * FROM temperatures"),
    "p08_star_statistics" -> withPrelude("SELECT * FROM statistics"),
    "p09_star_travelers" -> withPrelude("SELECT * FROM travelers"),
    "p10_validation_counts" -> withPrelude(
      """SELECT 'staging_airports' AS tbl, COUNT(*) AS n_rows FROM st_air
        |UNION ALL SELECT 'staging_cities', COUNT(*) FROM st_cities
        |UNION ALL SELECT 'staging_temperatures', COUNT(*) FROM st_temp
        |UNION ALL SELECT 'staging_travelers', COUNT(*) FROM st_trav
        |UNION ALL SELECT 'visa_codes', COUNT(*) FROM visa_codes
        |UNION ALL SELECT 'city', COUNT(*) FROM city
        |UNION ALL SELECT 'airports', COUNT(*) FROM airports
        |UNION ALL SELECT 'temperatures', COUNT(*) FROM temperatures
        |UNION ALL SELECT 'statistics', COUNT(*) FROM statistics
        |UNION ALL SELECT 'travelers', COUNT(*) FROM travelers
        |ORDER BY tbl""".stripMargin),
    "p11_q1" -> withPrelude(
      """SELECT avg_age, s_median_age, c_name, c_state_code FROM
        | (SELECT avg(p_age) AS avg_age, a_city_id AS age_city_id FROM travelers
        |  JOIN airports ON p_airport_id = a_id
        |  JOIN city ON a_city_id = c_id
        |  GROUP BY a_city_id) AS averages
        | JOIN city ON c_id = age_city_id
        | JOIN statistics ON s_city_id = c_id
        |ORDER BY s_median_age DESC""".stripMargin),
    "p12_q2" -> withPrelude(
      s"""SELECT c_name, c_state_code, s_per_foreign_born, cnt FROM statistics JOIN (
         |$perCityCnt) AS t
         |ON t.c_id = s_city_id
         |JOIN city AS c ON s_city_id = c.c_id
         |ORDER BY s_per_foreign_born DESC""".stripMargin),
    "p13_q3" -> withPrelude(
      s"""SELECT c_name, c_state_code, t_average_temp_month, cnt,
         |  ROUND(100 * (CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)), 2) AS percent_of_total_travelers
         |FROM temperatures
         |JOIN ($perCityCnt) AS t ON t.c_id = t_city_id
         |JOIN city AS c ON t_city_id = c.c_id
         |CROSS JOIN (SELECT count(*) AS total FROM travelers)
         |WHERE t_year = '2013' AND t_month = '4'
         |ORDER BY percent_of_total_travelers DESC""".stripMargin),
    // Q1 with the month restriction applied to the fact — the partition
    // layout changes the Spark plan (DPP directory pruning), never the
    // result, so the oracle is the filtered Q1
    "p14_partitioned_q1" -> withPrelude(
      """SELECT avg_age, s_median_age, c_name, c_state_code FROM
        | (SELECT avg(p_age) AS avg_age, a_city_id AS age_city_id FROM travelers
        |  JOIN airports ON p_airport_id = a_id
        |  JOIN city ON a_city_id = c_id
        |  WHERE p_arrival_year = 2016 AND p_arrival_month = 4
        |  GROUP BY a_city_id) AS averages
        | JOIN city ON c_id = age_city_id
        | JOIN statistics ON s_city_id = c_id
        |ORDER BY s_median_age DESC""".stripMargin))
}
