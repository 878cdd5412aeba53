package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.pipeline.AirportsPrep

/** Property tests (SURVEY §5.2 item 4) for the scalar rules that carry
  * the trickiest semantics: hemisphere sign formatting and the SAS epoch
  * decode, driven through real Spark plans on generated inputs.
  */
class PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.session

  test("warmOutliers invariants hold on generated timing tables") {
    // the warm/cold rail decides which queries demand an isolated
    // breakdown — its edge behavior must be exact on any input: sound
    // (everything returned really violates the rail), complete (every
    // violator with a warm run is returned), values copied faithfully,
    // output sorted
    val gen = for {
      names <- Gen.listOfN(30, Gen.identifier.map(_.take(8))).map(_.distinct)
      cold <- Gen.listOfN(names.size, Gen.chooseNum(0.01, 20.0))
      warmSubset <- Gen.someOf(names)
      warm <- Gen.listOfN(warmSubset.size, Gen.chooseNum(0.01, 40.0))
    } yield (names.zip(cold), warmSubset.toSeq.zip(warm))
    for (_ <- 1 to 200) {
      val (cold, warm) = gen.sample.getOrElse(sys.error("gen failed"))
      val coldM = cold.toMap
      val out = Bench.warmOutliers(cold, warm)
      assert(out.map(_._1) == out.map(_._1).sorted)
      for ((n, c, w) <- out) {
        assert(coldM(n) == c && warm.toMap.apply(n) == w)
        assert(w > 1.5 * c && w - c > 0.2, s"$n $c $w not a violation")
      }
      val returned = out.map(_._1).toSet
      for ((n, w) <- warm if coldM.contains(n))
        if (w > 1.5 * coldM(n) && w - coldM(n) > 0.2)
          assert(returned(n), s"missed violator $n cold=${coldM(n)} warm=$w")
    }
  }

  test("hemisphere format: sign encodes into suffix, magnitude round-trips") {
    import spark.implicits._
    val coords = Gen.listOfN(50, Gen.chooseNum(-17999, 17999)).sample.get
      .map(_ / 100.0)
    val df = coords.toDF("x")
      .select(col("x"), AirportsPrep.hemisphere(round(col("x"), 2), "W", "E").as("fmt"))
    df.collect().foreach { r =>
      val (x, fmt) = (r.getDouble(0), r.getString(1))
      assert(fmt.endsWith(if (x < 0) "W" else "E"), s"$x -> $fmt")
      assert(math.abs(fmt.dropRight(1).toDouble - math.abs(x)) < 0.005 + 1e-9, s"$x -> $fmt")
    }
  }

  test("SAS date decode: days offset round-trips via datediff") {
    import spark.implicits._
    val days = Gen.listOfN(50, Gen.chooseNum(0, 40000)).sample.get
    val df = days.toDF("d").select(col("d"),
      date_add(to_date(lit("1960-01-01")), col("d")).as("dt"))
    val back = df.select(col("d"),
      datediff(col("dt"), to_date(lit("1960-01-01"))).as("d2"))
    assert(back.filter(col("d") =!= col("d2")).count() == 0)
  }

  test("pivot then unpivot is identity on complete long-form data") {
    import spark.implicits._
    val cities = Gen.listOfN(8, Gen.alphaStr.suchThat(_.nonEmpty).map(_.take(6))).sample.get.distinct
    val races = Seq("A", "B", "C")
    val rows = for (c <- cities; r <- races)
      yield (c, r, math.abs((c + r).hashCode % 1000).toLong)
    val long = rows.toDF("city", "race", "cnt")
    val piv = long.groupBy("city").pivot("race", races).agg(first("cnt"))
    val back = piv.unpivot(Array(col("city")), races.map(col).toArray, "race", "cnt")
    val got = back.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == rows.toSet)
  }

  test("cities prep resolves conflicting (City, State) duplicates to one deterministic row") {
    import graft.pipeline.CitiesPrep
    val dir = java.nio.file.Files.createTempDirectory("cities_conflict")
    val f = dir.resolve("cities.csv")
    val header = "City;State;Median Age;Male Population;Female Population;" +
      "Total Population;Number of Veterans;Foreign-born;Average Household Size;" +
      "State Code;Race;Count"
    val base1 = "Aville;Alpha;30.0;100;110;210;10;20;2.5;AL"
    val base2 = "Aville;Alpha;25.0;999;110;210;10;20;2.5;AL" // conflicting duplicate
    val races = Seq("White" -> 50, "Hispanic or Latino" -> 30, "Asian" -> 20,
      "American Indian and Alaska Native" -> 5, "Black or African-American" -> 40)
    val rows = races.map { case (r, c) => s"$base1;$r;$c" } :+ s"$base2;White;45"
    java.nio.file.Files.write(f, (header +: rows).mkString("\n").getBytes("UTF-8"))
    val out = CitiesPrep.staging(spark, f.toString).collect()
    // the round-2 formulation (groupBy all base columns) would emit TWO
    // rows here; the keep-first pin must emit exactly one
    assert(out.length == 1, s"expected 1 row, got ${out.length}")
    val row = out.head
    // lexicographically smallest base tuple wins (Median Age 25.0 < 30.0)
    assert(row.getAs[Double]("median_age") == 25.0)
    assert(row.getAs[Int]("cnt_male") == 999)
    // duplicate race rows resolve to min(Count)
    assert(row.getAs[Int]("cnt_white") == 45)
    assert(row.getAs[Double]("per_white") == 0.21) // round(45/210, 2)
  }

  test("quantized cosine is symmetric and bounded") {
    import spark.implicits._
    import graft.operators.VectorSearch
    graft.functions.LongArrayDot.register(spark)
    val vecs = Gen.listOfN(20, Gen.listOfN(8, Gen.chooseNum(-100, 100).map(_ / 100.0f)))
      .sample.get.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
    val df = vecs.toDF("id", "v")
      .select(col("id"), VectorSearch.quantize(col("v")).as("qv"))
      .withColumn("n2", VectorSearch.inorm2(col("qv")))
      .filter(col("n2") > 0)
    val a = df.select(col("id").as("ia"), col("qv").as("qa"), col("n2").as("na"))
    val b = df.select(col("id").as("ib"), col("qv").as("qb"), col("n2").as("nb"))
    val sims = a.crossJoin(b)
      .select(col("ia"), col("ib"),
        VectorSearch.qcosine(VectorSearch.idot(col("qa"), col("qb")), col("na"), col("nb")).as("s"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    sims.foreach { case ((i, j), s) =>
      assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9)
      assert(s == sims((j, i)), s"asymmetry at ($i,$j)")
      if (i == j) assert(math.abs(s - 1.0) < 1e-12)
    }
  }

  test("t23 normalization is idempotent on generated noisy strings") {
    import spark.implicits._
    val noisyChar = Gen.oneOf(
      Gen.alphaNumChar, Gen.const(' '), Gen.const('\t'), Gen.const('\u0007'),
      Gen.const('\u200B'), Gen.const('\uFEFF'), Gen.const('\u007F'))
    val strings = Gen.listOfN(200, Gen.listOfN(30, noisyChar).map(_.mkString))
      .sample.get
    // the SHIPPED expression, not a re-implementation — tracks the
    // production character classes if they ever change
    import graft.operators.TextAnalysis
    val df = strings.toDF("s")
      .select(TextAnalysis.normalized(col("s")).as("once"))
      .withColumn("twice", TextAnalysis.normalized(col("once")))
    assert(df.filter(col("once") =!= col("twice")).count() == 0)
    // fixpoint contains no target characters at all
    assert(df.filter(
      col("once").rlike(TextAnalysis.ControlRe) ||
      col("once").rlike(TextAnalysis.ZeroWidthRe) ||
      col("once").rlike("\\s\\s") || col("once").rlike("^\\s|\\s$")).count() == 0)
  }

  test("k03 packing conserves tokens and fills bins exactly for generated counts") {
    import spark.implicits._
    val counts = Gen.listOfN(120, Gen.chooseNum(0L, 600L)).sample.get.zipWithIndex
      .map { case (n, i) => (i.toLong, n) }
    val b = 256L
    val df = counts.toDF("doc_id", "n")
    val pos = graft.operators.Keys
      .scalablePrefixSum(df, Seq(col("doc_id")), col("n"), "s")
      .filter(col("n") > 0)
      .withColumn("e", col("s") + col("n"))
      .withColumn("bin_id", explode(expr(s"sequence(s div $b, (e - 1) div $b)")))
      .groupBy(col("bin_id"))
      .agg(sum(least(col("e"), (col("bin_id") + 1) * b) -
        greatest(col("s"), col("bin_id") * b)).as("occ"))
      .orderBy(col("bin_id")).collect()
    val total = counts.map(_._2).sum
    assert(pos.map(_.getAs[Long]("occ")).sum == total)
    pos.init.foreach(r => assert(r.getAs[Long]("occ") == b,
      s"bin ${r.getLong(0)} holds ${r.getLong(1)} of $b"))
  }
}
