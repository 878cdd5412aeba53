package graft.pipeline

import org.apache.spark.sql.types._

/** Explicit StructTypes for the reference pipeline's four raw inputs
  * (schema inference is non-deterministic at scale — SURVEY.md §1.3).
  *
  * Raw schemas mirror the reference inputs:
  *  - demographics CSV (`;`-sep): /root/reference/input_data, read at
  *    dataprep.py:19
  *  - airport codes CSV (ourairports layout, dataprep.py:102) and Kaggle
  *    city temperatures CSV (dataprep.py:155): the reference repo ships
  *    neither (.MISSING_LARGE_BLOBS), so deterministic fixtures with the
  *    same layout live in /root/repo/fixtures (see FIXTURES.md)
  *  - I-94 sample CSV: the 28 SAS columns of dataprep.py:201 plus the
  *    sample's leading index column
  */
object Schemas {

  val RefInputDir = "/root/reference/input_data"
  val FixtureDir = "/root/repo/fixtures"

  val citiesCsv = s"$RefInputDir/us-cities-demographics.csv"
  val travelersCsv = s"$RefInputDir/immigration_data_sample.csv"
  val airportsCsv = s"$FixtureDir/airport-codes_csv.csv"
  val temperaturesCsv = s"$FixtureDir/GlobalLandTemperaturesByCity.csv"

  val rawCities: StructType = StructType(Seq(
    StructField("City", StringType),
    StructField("State", StringType),
    StructField("Median Age", DoubleType),
    StructField("Male Population", IntegerType),
    StructField("Female Population", IntegerType),
    StructField("Total Population", IntegerType),
    StructField("Number of Veterans", IntegerType),
    StructField("Foreign-born", IntegerType),
    StructField("Average Household Size", DoubleType),
    StructField("State Code", StringType),
    StructField("Race", StringType),
    StructField("Count", IntegerType)))

  val rawAirports: StructType = StructType(Seq(
    StructField("ident", StringType),
    StructField("type", StringType),
    StructField("name", StringType),
    StructField("elevation_ft", DoubleType),
    StructField("continent", StringType),
    StructField("iso_country", StringType),
    StructField("iso_region", StringType),
    StructField("municipality", StringType),
    StructField("gps_code", StringType),
    StructField("iata_code", StringType),
    StructField("local_code", StringType),
    StructField("coordinates", StringType)))

  val rawTemperatures: StructType = StructType(Seq(
    StructField("dt", StringType),
    StructField("AverageTemperature", DoubleType),
    StructField("AverageTemperatureUncertainty", DoubleType),
    StructField("City", StringType),
    StructField("Country", StringType),
    StructField("Latitude", StringType),
    StructField("Longitude", StringType)))

  /** 28 raw I-94 columns (dataprep.py:201-204 contract) + the CSV
    * sample's unnamed leading index. Only 6 survive projection (P6).
    */
  val rawI94: StructType = StructType(
    StructField("row_idx", LongType) +: Seq(
      ("cicid", DoubleType), ("i94yr", DoubleType), ("i94mon", DoubleType),
      ("i94cit", DoubleType), ("i94res", DoubleType), ("i94port", StringType),
      ("arrdate", DoubleType), ("i94mode", DoubleType), ("i94addr", StringType),
      ("depdate", DoubleType), ("i94bir", DoubleType), ("i94visa", DoubleType),
      ("count", DoubleType), ("dtadfile", StringType), ("visapost", StringType),
      ("occup", StringType), ("entdepa", StringType), ("entdepd", StringType),
      ("entdepu", StringType), ("matflag", StringType), ("biryear", DoubleType),
      ("dtaddto", StringType), ("gender", StringType), ("insnum", StringType),
      ("airline", StringType), ("admnum", DoubleType), ("fltno", StringType),
      ("visatype", StringType)).map { case (n, t) => StructField(n, t) })
}
