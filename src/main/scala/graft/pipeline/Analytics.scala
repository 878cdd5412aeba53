package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import StarSchema.Star

/** The reference's three declared analytical queries
  * (README.md:172-214), as DataFrame builders over the star schema.
  *
  * Join strategy at scale: `travelers` is the fact; `airports`, `city`,
  * `statistics`, `temperatures` are broadcast dims, so each query is one
  * scan of the fact with broadcast hash joins plus one aggregation
  * shuffle on the (tiny) city-id key space.
  */
object Analytics {

  /** Inner derived table shared by the three queries: traveler counts
    * (or ages) per city id, travelers⋈airports⋈city (README.md:173-177).
    */
  private def perCity(star: Star, withStats: Boolean): DataFrame = {
    val base = star.travelers
      .join(broadcast(star.airports), col("p_airport_id") === col("a_id"))
      .join(broadcast(star.city), col("a_city_id") === col("c_id"))
    if (withStats) base.join(broadcast(star.statistics), col("s_city_id") === col("c_id"))
    else base
  }

  /** Q1 (README.md:172-179): average traveler age per city, ordered by
    * the city's median age.
    */
  def q1(star: Star): DataFrame = {
    val averages = perCity(star, withStats = false)
      .groupBy(col("a_city_id"))
      .agg(avg(col("p_age")).as("avg_age"))
      .select(col("avg_age"), col("a_city_id").as("age_city_id"))
    averages
      .join(broadcast(star.city), col("c_id") === col("age_city_id"))
      .join(broadcast(star.statistics), col("s_city_id") === col("c_id"))
      .select(col("avg_age"), col("s_median_age"), col("c_name"), col("c_state_code"))
      .orderBy(col("s_median_age").desc)
  }

  /** Q2 (README.md:185-194): traveler count per city ranked by
    * foreign-born percentage. The inner subquery joins statistics too
    * (cities without statistics drop before counting — reference shape).
    */
  def q2(star: Star): DataFrame = {
    val t = perCity(star, withStats = true)
      .groupBy(col("c_id")).agg(count(lit(1)).as("cnt"))
    star.statistics.as("s")
      .join(t.as("t"), col("t.c_id") === col("s.s_city_id"))
      .join(broadcast(star.city.as("c")), col("s.s_city_id") === col("c.c_id"))
      .select(col("c.c_name"), col("c.c_state_code"),
        col("s.s_per_foreign_born"), col("t.cnt"))
      .orderBy(col("s_per_foreign_born").desc)
  }

  /** Q3 (README.md:200-214): warm-destination share — per-city traveler
    * counts joined to April-2013 temperatures, cross-joined with the
    * one-row grand total for the percentage.
    */
  def q3(star: Star): DataFrame = {
    val t = perCity(star, withStats = true)
      .groupBy(col("c_id")).agg(count(lit(1)).as("cnt"))
    val total = star.travelers.agg(count(lit(1)).as("total"))
    star.temperatures.as("tp")
      .join(t.as("t"), col("t.c_id") === col("tp.t_city_id"))
      .join(broadcast(star.city.as("c")), col("tp.t_city_id") === col("c.c_id"))
      .crossJoin(broadcast(total))
      .filter(col("t_year") === "2013" && col("t_month") === "4")
      .select(col("c.c_name"), col("c.c_state_code"),
        col("tp.t_average_temp_month"), col("t.cnt"),
        round(lit(100) * (col("cnt").cast(DoubleType) / col("total").cast(DoubleType)), 2)
          .as("percent_of_total_travelers"))
      .orderBy(col("percent_of_total_travelers").desc)
  }
}
