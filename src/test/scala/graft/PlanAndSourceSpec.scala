package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.Tables

/** Physical-plan shape assertions (the plans that must survive a 100x
  * scale-up) and source-matrix unit checks.
  */
class PlanAndSourceSpec extends SparkSpec {

  test("dimension joins broadcast the dimension side") {
    val li = Tables.open(spark, sf, "lineitem")
    val part = Tables.open(spark, sf, "part")
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    val plan = Joins.withDim(li, part, Seq("l_partkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dim join not broadcast:\n$plan")
  }

  test("dense pair queries contain no cartesian or nested-loop join") {
    Seq(
      Dedup.jaccardPairsDense(Tables.open(spark, sf, "documents"), "doc_id", "text"),
      Similarity.cosineDupPairs(Tables.open(spark, sf, "embeddings"), "vec_id", "embedding", 0.45),
      Dedup.simHashPairs(Tables.open(spark, sf, "documents"), "doc_id", "text"))
      .foreach { df =>
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
          s"all-pairs shape leaked into plan:\n${plan.take(2000)}")
      }
  }

  test("salted equi join equals the plain join and spreads the key space") {
    val li = Tables.open(spark, sf, "lineitem")
    val part = Tables.open(spark, sf, "part")
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    val plain = li.join(part, Seq("l_partkey"))
      .groupBy("p_brand").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Joins.saltedEqui(li, part, Seq("l_partkey"), "l_orderkey", salts = 8)
      .groupBy("p_brand").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("theta join extracts the equi conjunct (no nested loop)") {
    val sup = Tables.open(spark, sf, "supplier")
    val a = sup.select(col("s_nationkey").as("nk1"), col("s_acctbal").as("b1"))
    val b = sup.select(col("s_nationkey").as("nk2"), col("s_acctbal").as("b2"))
    val plan = Joins.theta(a, b, col("nk1") === col("nk2") && col("b1") > col("b2"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"theta join fell back to nested loop:\n$plan")
  }

  test("bucketed tables sort-merge join with no shuffle and no sort") {
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables.writeBucketed(
        Tables.open(spark, sf, "orders").select("o_orderkey", "o_totalprice"),
        "b_orders", "o_orderkey", 8)
      Tables.writeBucketed(
        Tables.open(spark, sf, "lineitem").select("l_orderkey", "l_quantity"),
        "b_lineitem", "l_orderkey", 8)
      val bl = spark.table("b_lineitem")
      val bo = spark.table("b_orders")
      val joined = bl.join(bo, bl("l_orderkey") === bo("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == bl.count(), "every lineitem joins its order")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("CSV loader infers header names and column kinds") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_infer").toString
    Tables.exportCsv(
      Tables.open(spark, sf, "lineitem")
        .select("l_orderkey", "l_quantity", "l_returnflag").limit(100), dir)
    val back = Tables.csv(spark, dir)
    assert(back.columns.toSeq == Seq("l_orderkey", "l_quantity", "l_returnflag"))
    val kinds = back.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(kinds("l_orderkey") == "integer" || kinds("l_orderkey") == "long",
      s"orderkey inferred as ${kinds("l_orderkey")}")
    assert(kinds("l_quantity") == "double")
    assert(kinds("l_returnflag") == "string")
    assert(back.count() == 100)
  }

  test("explicit-schema CSV/JSON re-reads equal the inferring reads") {
    // the roundtrip queries re-read with the WRITER's schema (killing
    // inference's second full scan, guide §6); this pins that inference
    // would have produced the identical schema and values, so the
    // lossless-round-trip certification is unchanged
    val csvDir = java.nio.file.Files.createTempDirectory("graft_csv_sch").toString
    val csvSrc = Tables.open(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity").limit(200)
    Tables.exportCsv(csvSrc, csvDir)
    val inferred = Tables.csv(spark, csvDir)
    val explicit = Tables.csvWithSchema(spark, csvDir, csvSrc.schema)
    assert(inferred.schema == explicit.schema,
      s"CSV inference diverged: ${inferred.schema} vs ${explicit.schema}")
    assert(inferred.collect().map(_.toSeq).toSet == explicit.collect().map(_.toSeq).toSet)

    val jsonDir = java.nio.file.Files.createTempDirectory("graft_json_sch").toString
    val jsonSrc = Tables.open(spark, sf, "orders")
      .select("o_orderstatus", "o_totalprice").limit(200)
    jsonSrc.write.mode("overwrite").json(jsonDir)
    val jInferred = Tables.json(spark, jsonDir)
    val jExplicit = Tables.jsonWithSchema(spark, jsonDir, jsonSrc.schema)
    // inferring JSON orders fields alphabetically; compare field sets and
    // per-field types, then values by name
    assert(jInferred.schema.fields.map(f => f.name -> f.dataType).toMap ==
      jExplicit.schema.fields.map(f => f.name -> f.dataType).toMap,
      s"JSON inference diverged: ${jInferred.schema} vs ${jExplicit.schema}")
    assert(
      jInferred.select(col("o_orderstatus"), col("o_totalprice")).collect().map(_.toSeq).toSet ==
        jExplicit.select(col("o_orderstatus"), col("o_totalprice")).collect().map(_.toSeq).toSet)
  }

  test("hive-partitioned layout prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.open(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
    val filtered = spark.read.parquet(dir).filter(col("l_returnflag") === "R")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("l_returnflag"),
      s"no partition pruning evidence:\n$plan")
    val full = Tables.open(spark, sf, "lineitem")
      .filter(col("l_returnflag") === "R").count()
    assert(filtered.count() == full)
  }

  test("JDBC round trip: write a slice to embedded Derby, load, aggregate") {
    // Derby ships on the Spark classpath; an embedded file DB is the same
    // spark.read.jdbc path a networked warehouse would use, minus the wire
    val db = java.nio.file.Files.createTempDirectory("graft_derby").resolve("db")
    val url = s"jdbc:derby:$db;create=true"
    val props = new java.util.Properties
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val slice = Tables.open(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag").limit(500)
    slice.write.mode("overwrite").jdbc(url, "li_slice", props)
    val back = Tables.jdbc(spark, url, "li_slice", props)
    assert(back.columns.map(_.toLowerCase).toSeq ==
      Seq("l_orderkey", "l_quantity", "l_returnflag"))
    val agg = back.groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("qty"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exp = slice.groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("qty"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(agg == exp, "JDBC round trip must preserve every group")
  }

  test("GraftExtensions injects the native functions into a fresh session") {
    import org.apache.spark.sql.SparkSession
    // build a second SparkSession over the SAME SparkContext with the
    // extension applied (clear default/active so getOrCreate builds anew;
    // never stop s2 — that would stop the shared context)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      val r = s2.sql(
        """SELECT graft_fdot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                  array(CAST(3.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d,
          |       graft_hyperplane_sig(array(CAST(1.0 AS FLOAT)),
          |                            array(array(2.0D), array(-1.0D))) AS sig,
          |       graft_nearest_centroids(array(CAST(0.9 AS FLOAT)),
          |                               array(array(0.0D), array(1.0D)), 1) AS b
          |""".stripMargin).head()
      assert(r.getDouble(0) == 1.5 * 3.0 + 2.0 * 0.5)
      assert(r.getLong(1) == 1L, "positive projection sets bit 0 only")
      assert(r.getSeq[Int](2) == Seq(1), "0.9 is nearest centroid 1")
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("registerAll memo re-registers after external view drop OR replacement") {
    import spark.implicits._
    Tables.registerAll(spark, sf)
    val trueCount = spark.sql("SELECT COUNT(*) FROM region").head.getLong(0)
    // replacement: a same-named temp view with DIFFERENT data must not be
    // served as fixture data by a memoized short-circuit
    Seq((1, "hijacked")).toDF("r_regionkey", "r_name").createOrReplaceTempView("region")
    Tables.registerAll(spark, sf)
    assert(spark.sql("SELECT COUNT(*) FROM region").head.getLong(0) == trueCount,
      "memo served a hijacked view")
    // drop: a missing view must be restored
    spark.catalog.dropTempView("region")
    Tables.registerAll(spark, sf)
    assert(spark.sql("SELECT COUNT(*) FROM region").head.getLong(0) == trueCount,
      "memo skipped re-registering a dropped view")
  }

  test("registerAll memo still short-circuits after System.gc()") {
    // the memo's plan refs are WEAK; the load-bearing assumption is that
    // the catalog strongly holds each registered plan, so a GC must not
    // clear the refs and silently force re-registration on every call.
    // Identity hashes (not the refs themselves) are captured so the test
    // does not add its own strong hold and mask a catalog regression.
    import org.apache.spark.sql.graftshim.Internals
    Tables.registerAll(spark, sf)
    val before = Tables.allTables.map(n =>
      n -> System.identityHashCode(Internals.tempViewPlan(spark, n).get)).toMap
    System.gc(); Thread.sleep(50); System.gc()
    Tables.registerAll(spark, sf)
    Tables.allTables.foreach { n =>
      val now = System.identityHashCode(Internals.tempViewPlan(spark, n).get)
      assert(now == before(n),
        s"$n was re-registered after GC — the weak memo refs were collected, " +
          "so the catalog no longer strongly holds the registered plan")
    }
  }

  test("cached-table registry persists once and purges on demand") {
    Tables.purgeCached(sf)
    val a = Tables.openCached(spark, sf, "nation")
    val b = Tables.openCached(spark, sf, "nation")
    assert(a eq b, "second open must hit the registry")
    assert(a.storageLevel.useMemory, "registry table must be persisted")
    Tables.purgeCached(sf, "nation")
    assert(!a.storageLevel.useMemory, "purge must unpersist")
    val c = Tables.openCached(spark, sf, "nation")
    assert(!(a eq c), "purge must evict the registry entry")
    Tables.purgeCached(sf)
  }
}
