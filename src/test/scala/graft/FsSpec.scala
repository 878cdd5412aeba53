package graft

/** Pins Fs.sweepStaleScratch's ownership rules, including the round-12
  * grace margin: a live process whose startInstant is within 60 s AFTER
  * a dir's mtime may still be the true owner (start-time and mtime come
  * from different clocks — NTP slew / coarse mtime granularity), so only
  * clearly-later starts count as a recycled pid.
  */
class FsSpec extends SparkSpec {

  test("sweepStaleScratch: live owner within the 60s grace is kept, clearly-later start is swept, dead pid is swept, own dir is kept") {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    val prefix = "graft_fsspec_"
    val p = new ProcessBuilder("sleep", "30").start()
    val started = p.toHandle.info().startInstant().get.toEpochMilli
    def mk(name: String, mtime: Long): java.io.File = {
      val d = new java.io.File(tmp, name)
      d.mkdirs()
      assert(d.setLastModified(mtime), s"could not set mtime on $d")
      d
    }
    // start 30 s after mtime: inside the grace margin -> NOT recycled
    val withinGrace = mk(s"${prefix}a_p${p.pid}", started - 30_000)
    // start 120 s after mtime: unambiguously recycled -> swept
    val beyondGrace = mk(s"${prefix}b_p${p.pid}", started - 120_000)
    // pid above any real pid_max: owner dead -> swept regardless of age
    val dead = mk(s"${prefix}c_p${999999999L}", System.currentTimeMillis())
    // our own live dir (start long before mtime) -> kept
    val ours =
      mk(s"${prefix}d_p${ProcessHandle.current().pid()}", System.currentTimeMillis())
    try {
      Fs.sweepStaleScratch(prefix)
      assert(withinGrace.exists, "live owner inside the grace margin was swept")
      assert(!beyondGrace.exists, "clearly-recycled pid dir survived the sweep")
      assert(!dead.exists, "dead-pid dir survived the sweep")
      assert(ours.exists, "this JVM's own live dir was swept")
    } finally {
      p.destroyForcibly(); p.waitFor()
      Seq(withinGrace, beyondGrace, dead, ours).foreach(Fs.rmTree)
    }
  }

  test("readBatchDirs evaluates the empty-frame schema only on the zero-batch path") {
    val base = java.nio.file.Files.createTempDirectory("graft_fsspec_rbd").toFile
    try {
      // batch dir present: by-name schema must NOT be forced
      val b0 = new java.io.File(base, "b0")
      spark.range(3).toDF("v").write.parquet(b0.getPath)
      var forced = false
      val df = Fs.readBatchDirs(spark, base.getPath,
        { forced = true; org.apache.spark.sql.types.StructType(Nil) })
      assert(df.count() == 3)
      assert(!forced, "warm path paid the empty-schema derivation")
      // zero-batch dir: schema IS forced and typed empty frame comes back
      val empty = java.nio.file.Files.createTempDirectory("graft_fsspec_e").toFile
      try {
        val df2 = Fs.readBatchDirs(spark, empty.getPath,
          { forced = true
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("v",
                org.apache.spark.sql.types.LongType))) })
        assert(forced && df2.isEmpty && df2.schema.fieldNames.sameElements(Array("v")))
      } finally Fs.rmTree(empty)
    } finally Fs.rmTree(base)
  }
}
