package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Named-catalog surface: `CREATE TABLE graftcat.db.t USING graft`,
  * SHOW TABLES, name-based reads/writes/DML, CTAS, and durability (the
  * registry is the warehouse directory layout).
  */
class GraftCatalogSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val w = graft.TempDirs.create("graft-warehouse")
    spark.conf.set("spark.sql.catalog.graftcat",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftcat.warehouse", w)
    w
  }

  private def init(): Unit = {
    warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftcat.db")
  }

  test("create, list, insert, read by name, drop") {
    init()
    spark.sql(
      """CREATE TABLE graftcat.db.t1 (id BIGINT, tag STRING, p STRING)
        |USING graft PARTITIONED BY (p)""".stripMargin)
    val shown = spark.sql("SHOW TABLES IN graftcat.db").collect()
      .map(_.getString(1))
    assert(shown.contains("t1"))
    // empty table serves an empty frame with the declared schema
    assert(spark.table("graftcat.db.t1").count() === 0L)
    assert(spark.table("graftcat.db.t1").schema.fieldNames.toSeq ===
      Seq("id", "tag", "p"))
    // metadata-only COUNT on the empty declaration
    assert(spark.sql("SELECT COUNT(*) FROM graftcat.db.t1")
      .head().getLong(0) === 0L)
    spark.sql(
      """INSERT INTO graftcat.db.t1
        |SELECT id, CONCAT('x', id), CASE WHEN id % 2 = 0 THEN 'even'
        |  ELSE 'odd' END FROM RANGE(100)""".stripMargin)
    assert(spark.table("graftcat.db.t1").count() === 100L)
    // the declared partition spec drove the layout: k=v dirs + stats
    val dir = s"$warehouse/db/t1"
    val m = Snapshots.readManifest(spark, dir,
      Snapshots.latestVersion(spark, dir).get)
    assert(m.partitionCols === Seq("p"))
    assert(m.files.nonEmpty && m.files.forall(_.contains("/p=")))
    // name-based grouped metadata count
    val grouped = spark.sql(
      "SELECT p, COUNT(*) AS n FROM graftcat.db.t1 GROUP BY p")
    assert(grouped.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.nonEmpty, "grouped count by name must serve from the manifest")
    assert(grouped.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === Map("even" -> 50L, "odd" -> 50L))
    // INSERT OVERWRITE replaces the snapshot
    spark.sql(
      "INSERT OVERWRITE graftcat.db.t1 SELECT id, 'ow', 'all' FROM RANGE(7)")
    assert(spark.table("graftcat.db.t1").count() === 7L)
    // time travel by name is reachable path-wise; drop removes the dir
    assert(spark.sql("SELECT COUNT(*) FROM graftcat.db.t1").head().getLong(0) === 7L)
    spark.sql("DROP TABLE graftcat.db.t1")
    assert(!spark.sql("SHOW TABLES IN graftcat.db").collect()
      .map(_.getString(1)).contains("t1"))
  }

  test("CTAS by name, and SQL DML routed through the named table") {
    init()
    spark.sql("DROP TABLE IF EXISTS graftcat.db.t2")
    spark.sql(
      """CREATE TABLE graftcat.db.t2 USING graft AS
        |SELECT id, CAST(id * 2 AS DOUBLE) AS price FROM RANGE(50)""".stripMargin)
    assert(spark.table("graftcat.db.t2").count() === 50L)
    // row-level SQL DML by NAME (the V1 swap feeds GraftSqlDml)
    spark.sql("DELETE FROM graftcat.db.t2 WHERE id % 5 = 0")
    spark.sql("UPDATE graftcat.db.t2 SET price = price + 1 WHERE id < 10")
    val got = spark.table("graftcat.db.t2")
      .agg(count(lit(1)), sum("price")).head()
    val want = spark.range(50).filter(col("id") % 5 =!= 0)
      .select(col("id"), (col("id") * 2.0).as("price"))
      .withColumn("price",
        when(col("id") < 10, col("price") + 1).otherwise(col("price")))
      .agg(count(lit(1)), sum("price")).head()
    assert(got === want)
    // MERGE INTO by name
    spark.range(3).select((col("id") + 1000).as("id"),
      lit(9.0).as("price")).createOrReplaceTempView("cat_merge_src")
    spark.sql(
      """MERGE INTO graftcat.db.t2 t USING cat_merge_src s ON t.id = s.id
        |WHEN NOT MATCHED THEN INSERT (id, price) VALUES (s.id, s.price)""".stripMargin)
    assert(spark.table("graftcat.db.t2")
      .filter(col("id") >= 1000).count() === 3L)
    spark.sql("DROP TABLE graftcat.db.t2")
  }

  test("durability: a second catalog instance sees the same registry") {
    init()
    spark.sql("DROP TABLE IF EXISTS graftcat.db.t3")
    spark.sql("CREATE TABLE graftcat.db.t3 USING graft AS SELECT 1 AS one")
    // a NEW catalog instance over the same warehouse (what a fresh
    // session constructs) resolves the table purely from the dirs
    spark.conf.set("spark.sql.catalog.graftcat2",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftcat2.warehouse", warehouse)
    assert(spark.sql("SHOW TABLES IN graftcat2.db").collect()
      .map(_.getString(1)).contains("t3"))
    assert(spark.table("graftcat2.db.t3").head().getInt(0) === 1)
    spark.sql("DROP TABLE graftcat.db.t3")
  }

  test("VERSION AS OF / TIMESTAMP AS OF time travel by name") {
    init()
    spark.sql("DROP TABLE IF EXISTS graftcat.db.t5")
    spark.sql("CREATE TABLE graftcat.db.t5 USING graft AS " +
      "SELECT id FROM RANGE(10)")
    spark.sql("INSERT INTO graftcat.db.t5 SELECT id + 100 FROM RANGE(5)")
    assert(spark.table("graftcat.db.t5").count() === 15L)
    // CTAS = empty v0 declaration + v1 first data commit
    assert(spark.sql(
      "SELECT COUNT(*) FROM graftcat.db.t5 VERSION AS OF 0")
      .head().getLong(0) === 0L)
    assert(spark.sql(
      "SELECT COUNT(*) FROM graftcat.db.t5 VERSION AS OF 1")
      .head().getLong(0) === 10L)
    // TIMESTAMP AS OF now = latest
    assert(spark.sql(
      "SELECT COUNT(*) FROM graftcat.db.t5 TIMESTAMP AS OF current_timestamp()")
      .head().getLong(0) === 15L)
    spark.sql("DROP TABLE graftcat.db.t5")
  }

  test("ALTER TABLE ADD COLUMNS: metadata-only, old files read NULL") {
    init()
    spark.sql("DROP TABLE IF EXISTS graftcat.db.t6")
    spark.sql("CREATE TABLE graftcat.db.t6 USING graft AS " +
      "SELECT id FROM RANGE(5)")
    spark.sql("ALTER TABLE graftcat.db.t6 ADD COLUMNS (note STRING, w DOUBLE)")
    val t = spark.table("graftcat.db.t6")
    assert(t.schema.fieldNames.toSeq === Seq("id", "note", "w"))
    assert(t.filter(col("note").isNotNull).count() === 0L)
    // the evolution consumed one metadata-only version (CTAS = v0+v1)
    val dir = s"$warehouse/db/t6"
    assert(Snapshots.latestVersion(spark, dir).get === 2L)
    // new columns are insertable; old rows still NULL
    spark.sql("INSERT INTO graftcat.db.t6 SELECT 100, 'x', 1.5")
    val rows = spark.table("graftcat.db.t6").collect()
    assert(rows.length === 6)
    assert(rows.count(r => !r.isNullAt(1)) === 1)
    // unsupported change kinds still refused (narrowing type change)
    intercept[Exception] {
      spark.sql("ALTER TABLE graftcat.db.t6 ALTER COLUMN w TYPE INT")
    }
    spark.sql("DROP TABLE graftcat.db.t6")
  }

  test("REPLACE TABLE AS SELECT and TRUNCATE TABLE complete the DDL surface") {
    init()
    spark.sql("DROP TABLE IF EXISTS graftcat.db.t7")
    // REPLACE without OR CREATE on a missing table is refused
    intercept[Exception] {
      spark.sql("REPLACE TABLE graftcat.db.t7 USING graft AS SELECT 1 AS a")
    }
    spark.sql(
      "CREATE OR REPLACE TABLE graftcat.db.t7 USING graft AS SELECT 1 AS a")
    assert(spark.table("graftcat.db.t7").columns.toSeq === Seq("a"))
    // REPLACE redefines schema and contents (fresh registry entry)
    spark.sql(
      """REPLACE TABLE graftcat.db.t7 USING graft AS
        |SELECT id AS b, 'x' AS c FROM RANGE(4)""".stripMargin)
    assert(spark.table("graftcat.db.t7").columns.toSeq === Seq("b", "c"))
    assert(spark.table("graftcat.db.t7").count() === 4L)
    // TRUNCATE empties the latest version; prior versions time-travel
    spark.sql("TRUNCATE TABLE graftcat.db.t7")
    assert(spark.table("graftcat.db.t7").count() === 0L)
    assert(spark.sql("SELECT COUNT(*) FROM graftcat.db.t7 VERSION AS OF 1")
      .head().getLong(0) === 4L)
    // the declaration survives: inserts land against the same schema
    spark.sql("INSERT INTO graftcat.db.t7 SELECT 9, 'y'")
    assert(spark.table("graftcat.db.t7").count() === 1L)
    spark.sql("DROP TABLE graftcat.db.t7")
  }

  test("REPLACE TABLE is atomic: a failing SELECT leaves the table and its history") {
    init()
    spark.sql("DROP TABLE IF EXISTS graftcat.db.t8")
    spark.sql("CREATE TABLE graftcat.db.t8 USING graft AS " +
      "SELECT id FROM RANGE(6)")
    spark.sql("INSERT INTO graftcat.db.t8 SELECT id + 10 FROM RANGE(2)")
    // the replacement query fails at EXECUTION (raise_error) — with a
    // drop-then-recreate REPLACE the original table and its whole
    // version history would already be gone; the staged swap must
    // leave both untouched
    intercept[Exception] {
      spark.sql(
        """REPLACE TABLE graftcat.db.t8 USING graft AS
          |SELECT id, CAST(raise_error('replace boom') AS STRING) AS c
          |FROM RANGE(3)""".stripMargin)
    }
    assert(spark.table("graftcat.db.t8").count() === 8L)
    assert(spark.sql("SELECT COUNT(*) FROM graftcat.db.t8 VERSION AS OF 1")
      .head().getLong(0) === 6L) // full history intact
    // no staging residue surfaces from the registry
    assert(spark.sql("SHOW TABLES IN graftcat.db").collect()
      .map(_.getString(1)).forall(!_.contains("staging")))
    // and a SUCCEEDING replace still swaps in fresh history
    spark.sql("REPLACE TABLE graftcat.db.t8 USING graft AS " +
      "SELECT id AS b FROM RANGE(4)")
    assert(spark.table("graftcat.db.t8").columns.toSeq === Seq("b"))
    assert(spark.table("graftcat.db.t8").count() === 4L)
    spark.sql("DROP TABLE graftcat.db.t8")
  }

  test("PARTITIONED BY bucket(n, col): SQL-declared bucket layout") {
    init()
    spark.sql("DROP TABLE IF EXISTS graftcat.db.tb")
    spark.sql(
      """CREATE TABLE graftcat.db.tb (id BIGINT, v DOUBLE)
        |USING graft PARTITIONED BY (bucket(4, id))""".stripMargin)
    spark.sql(
      "INSERT INTO graftcat.db.tb SELECT id, CAST(id AS DOUBLE) FROM RANGE(100)")
    val dir = s"$warehouse/db/tb"
    val m = Snapshots.readManifest(spark, dir,
      Snapshots.latestVersion(spark, dir).get)
    assert(m.bucketSpec === Some(("id", 4)))
    assert(m.files.nonEmpty && m.files.forall(m.buckets.contains),
      "every INSERTed file must carry a bucket id")
    // a point lookup prunes to the wanted bucket's files
    val pruned = Snapshots.readVersionFiltered(spark, dir, None,
      Seq(org.apache.spark.sql.sources.EqualTo("id", 5L)))
    assert(pruned.inputFiles.length < m.files.size)
    assert(spark.sql("SELECT v FROM graftcat.db.tb WHERE id = 5")
      .head().getDouble(0) === 5.0)
    // two bucket transforms are refused before any state lands
    intercept[Exception] {
      spark.sql("CREATE TABLE graftcat.db.tb2 (a BIGINT, b BIGINT) " +
        "USING graft PARTITIONED BY (bucket(2, a), bucket(2, b))")
    }
    assert(!spark.sql("SHOW TABLES IN graftcat.db").collect()
      .map(_.getString(1)).contains("tb2"))
    spark.sql("DROP TABLE graftcat.db.tb")
  }

  test("a crash between the REPLACE swap renames is recovered on next access") {
    init()
    spark.sql("DROP TABLE IF EXISTS graftcat.db.t8r")
    spark.sql("CREATE TABLE graftcat.db.t8r USING graft AS " +
      "SELECT id FROM RANGE(9)")
    // simulate the promoteStaging crash window: the table dir was
    // moved aside but the staging dir never made it into place — the
    // registry has no live t8r, only the hidden .t8r.replaced-* copy
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(s"$warehouse/db/t8r")
    val aside = new org.apache.hadoop.fs.Path(
      s"$warehouse/db/.t8r.replaced-deadbeef")
    assert(fs.rename(dir, aside))
    // SHOW TABLES restores and lists it; reads see the original rows
    assert(spark.sql("SHOW TABLES IN graftcat.db").collect()
      .map(_.getString(1)).contains("t8r"))
    assert(spark.table("graftcat.db.t8r").count() === 9L)
    // loadTable-path recovery too (fresh crash, no listing first)
    assert(fs.rename(dir, aside))
    assert(spark.sql("SELECT COUNT(*) FROM graftcat.db.t8r")
      .head().getLong(0) === 9L)
    spark.sql("DROP TABLE graftcat.db.t8r")
  }

  test("DROP and RENAME purge stale REPLACE asides — no resurrection") {
    init()
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    spark.sql("DROP TABLE IF EXISTS graftcat.db.t8p")
    spark.sql("CREATE TABLE graftcat.db.t8p USING graft AS " +
      "SELECT id FROM RANGE(5)")
    // simulate a crash AFTER promoteStaging's staging rename but
    // BEFORE the aside delete: a live table dir AND a stale aside
    val stale = new org.apache.hadoop.fs.Path(
      s"$warehouse/db/.t8p.replaced-00c0ffee")
    fs.mkdirs(stale)
    // DROP must take the stale aside with it, or the next resolution
    // resurrects the dropped table as its pre-REPLACE contents
    spark.sql("DROP TABLE graftcat.db.t8p")
    assert(!fs.exists(stale), "dropTable must purge stale asides")
    assert(!spark.sql("SHOW TABLES IN graftcat.db").collect()
      .map(_.getString(1)).contains("t8p"), "dropped table must stay dropped")
    // same for RENAME: the old name's aside must not survive the move
    spark.sql("DROP TABLE IF EXISTS graftcat.db.t8q")
    spark.sql("DROP TABLE IF EXISTS graftcat.db.t8s")
    spark.sql("CREATE TABLE graftcat.db.t8q USING graft AS " +
      "SELECT id FROM RANGE(7)")
    val staleQ = new org.apache.hadoop.fs.Path(
      s"$warehouse/db/.t8q.replaced-00c0ffee")
    fs.mkdirs(staleQ)
    spark.sql("ALTER TABLE graftcat.db.t8q RENAME TO db.t8s")
    assert(!fs.exists(staleQ), "renameTable must purge old-name asides")
    assert(!spark.sql("SHOW TABLES IN graftcat.db").collect()
      .map(_.getString(1)).contains("t8q"))
    assert(spark.table("graftcat.db.t8s").count() === 7L)
    spark.sql("DROP TABLE graftcat.db.t8s")
  }

  test("CTAS failure leaves no orphan registry entry") {
    init()
    spark.sql("DROP TABLE IF EXISTS graftcat.db.t9")
    intercept[Exception] {
      spark.sql(
        """CREATE TABLE graftcat.db.t9 USING graft AS
          |SELECT CAST(raise_error('ctas boom') AS STRING) AS a""".stripMargin)
    }
    // the half-created entry was rolled back: the name is free again
    assert(!spark.sql("SHOW TABLES IN graftcat.db").collect()
      .map(_.getString(1)).contains("t9"))
    spark.sql("CREATE TABLE graftcat.db.t9 USING graft AS SELECT 1 AS a")
    assert(spark.table("graftcat.db.t9").count() === 1L)
    spark.sql("DROP TABLE graftcat.db.t9")
  }

  test("unsupported v2 write shapes are refused with a clean error") {
    init()
    spark.sql("DROP TABLE IF EXISTS graftcat.db.t10")
    spark.sql(
      """CREATE TABLE graftcat.db.t10 (id BIGINT, p STRING)
        |USING graft PARTITIONED BY (p)""".stripMargin)
    spark.sql("INSERT INTO graftcat.db.t10 SELECT id, 'a' FROM RANGE(3)")
    // static PARTITION spec = conditional overwrite: refused cleanly
    val e1 = intercept[Exception] {
      spark.sql("INSERT OVERWRITE graftcat.db.t10 PARTITION (p = 'a') " +
        "SELECT id FROM RANGE(2)")
    }
    assert(e1.getMessage.contains("PARTITION spec") ||
      Option(e1.getCause).exists(_.getMessage.contains("PARTITION spec")),
      e1.toString)
    // dynamic partition-overwrite mode: refused cleanly
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val e2 = intercept[Exception] {
        spark.sql("INSERT OVERWRITE graftcat.db.t10 SELECT id, 'b' FROM RANGE(2)")
      }
      assert(e2.getMessage.contains("dynamic partition overwrite") ||
        Option(e2.getCause).exists(
          _.getMessage.contains("dynamic partition overwrite")), e2.toString)
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    // the table is untouched by both refusals
    assert(spark.table("graftcat.db.t10").count() === 3L)
    spark.sql("DROP TABLE graftcat.db.t10")
  }

  test("CALL graftcat.system.*: the SQL maintenance surface") {
    init()
    spark.sql("DROP TABLE IF EXISTS graftcat.db.m1")
    spark.sql("CREATE TABLE graftcat.db.m1 USING graft AS " +
      "SELECT id, CAST(id * 3 AS DOUBLE) AS price FROM RANGE(200)")
    (0 until 3).foreach(i => spark.sql(
      s"INSERT INTO graftcat.db.m1 SELECT id + ${1000 * (i + 1)}, 1.0 FROM RANGE(50)"))
    spark.sql("DELETE FROM graftcat.db.m1 WHERE id % 10 = 9")
    val dir = s"$warehouse/db/m1"
    def m() = Snapshots.readManifest(spark, dir,
      Snapshots.latestVersion(spark, dir).get)
    val filesBefore = m().files.size
    assert(filesBefore > 1 && m().dvs.nonEmpty)
    // OPTIMIZE: fold the small files, applying + consolidating masks
    spark.sql("CALL graftcat.system.compact_small('db.m1', 10485760)")
    assert(m().files.size < filesBefore)
    assert(m().dvs.isEmpty) // every file rewritten -> masks applied
    val want = spark.range(200).select(col("id"), (col("id") * 3.0).as("price"))
      .unionByName((0 until 3).map(i => spark.range(50)
        .select((col("id") + 1000 * (i + 1)).as("id"), lit(1.0).as("price")))
        .reduce(_ unionByName _))
      .filter(col("id") % 10 =!= 9)
    val got = spark.table("graftcat.db.m1")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // named arguments and defaults come from the engine
    spark.sql("CALL graftcat.system.compact_sorted('db.m1', " +
      "num_files => 2, sort_col => 'id')")
    assert(m().files.size === 2)
    // CHECK management through CALL
    spark.sql("CALL graftcat.system.add_check('db.m1', 'pos', 'price >= 0')")
    intercept[Exception] {
      spark.sql("INSERT INTO graftcat.db.m1 SELECT -1, -5.0")
    }
    spark.sql("CALL graftcat.system.drop_check('db.m1', 'pos')")
    spark.sql("INSERT INTO graftcat.db.m1 SELECT -1, -5.0")
    assert(spark.table("graftcat.db.m1").count() === want.count() + 1)
    // OPTIMIZE ZORDER through CALL: both dimensions prune afterwards
    spark.sql("CALL graftcat.system.compact_zorder('db.m1', " +
      "num_files => 4, cols => 'id,price')")
    assert(m().files.size === 4)
    assert(Snapshots.pruneFiles(m(), "id", 0L, 40L).size < 4)
    assert(spark.table("graftcat.db.m1").count() === want.count() + 1)
    // VACUUM expires history below the floor
    val latest = Snapshots.latestVersion(spark, dir).get
    spark.sql(s"CALL graftcat.system.vacuum('db.m1', $latest)")
    intercept[Exception] {
      spark.sql("SELECT * FROM graftcat.db.m1 VERSION AS OF 0").collect()
    }
    assert(spark.table("graftcat.db.m1").count() === want.count() + 1)
    // unknown procedure: clean refusal listing the known ones
    val e = intercept[Exception] {
      spark.sql("CALL graftcat.system.nope('db.m1')")
    }
    assert(e.getMessage.contains("unknown procedure") ||
      Option(e.getCause).exists(_.getMessage.contains("unknown procedure")))
    // CALL history returns DESCRIBE-HISTORY rows (post-vacuum: the
    // one surviving version)
    val hist = spark.sql("CALL graftcat.system.history('db.m1')")
    val hrows = hist.collect()
    assert(hist.schema.fieldNames.contains("version"))
    assert(hrows.length === 1, hrows.mkString(","))
    // DESCRIBE DETAIL: one current-version row with exact accounting
    val det = spark.sql("CALL graftcat.system.detail('db.m1')").head()
    assert(det.getAs[Long]("n_files") === 4L)
    assert(det.getAs[Long]("n_bytes") > 0L)
    assert(det.getAs[Long]("n_data_rows") -
      det.getAs[Long]("n_dv_rows") ===
      spark.table("graftcat.db.m1").count())
    spark.sql("DROP TABLE graftcat.db.m1")
  }

  test("CALL graftcat.system.cluster_tail: the incremental SQL " +
    "re-cluster — tail gains mappings, bulk rides by reference (r15)") {
    init()
    spark.sql("DROP TABLE IF EXISTS graftcat.db.ct")
    spark.sql("CREATE TABLE graftcat.db.ct USING graft " +
      "PARTITIONED BY (bucket(4, id)) AS " +
      "SELECT id, CAST(id AS DOUBLE) AS v FROM RANGE(300)")
    val dir = s"$warehouse/db/ct"
    def m() = Snapshots.readManifest(spark, dir,
      Snapshots.latestVersion(spark, dir).get)
    val bulkFiles = m().files.toSet
    // a PLAIN append (no bucket spec) forms the unclustered tail
    val s2 = spark
    import s2.implicits._
    Snapshots.commit((1000L until 1050L).map(i => (i, i.toDouble))
      .toDF("id", "v"), dir, "append")
    assert(!m().files.forall(m().buckets.contains))
    spark.sql("CALL graftcat.system.cluster_tail('db.ct')")
    val after = m()
    assert(after.files.forall(after.buckets.contains))
    assert(bulkFiles.subsetOf(after.files.toSet), "bulk by reference")
    assert(spark.table("graftcat.db.ct").count() === 350L)
    // the SORTED upgrade path through SQL: compact_bucketed with
    // sort => true marks every file; a sorted cluster_tail keeps a
    // later plain append's repair on the sorted layout
    spark.sql("CALL graftcat.system.compact_bucketed('db.ct', 'id', 4, " +
      "sort => true)")
    val sorted = m()
    assert(sorted.sortedFiles.keySet === sorted.files.toSet,
      "compact_bucketed(sort) records the sorted layout")
    Snapshots.commit((2000L until 2010L).map(i => (i, i.toDouble))
      .toDF("id", "v"), dir, "append")
    spark.sql("CALL graftcat.system.cluster_tail('db.ct', sort => true)")
    val repaired = m()
    assert(repaired.sortedFiles.keySet === repaired.files.toSet,
      "cluster_tail(sort) keeps the sorted layout whole")
    assert(spark.table("graftcat.db.ct").count() === 360L)
    // the COMPOSITE order through SQL: sort_also appends secondary
    // columns to both rewrites' markers
    spark.sql("CALL graftcat.system.compact_bucketed('db.ct', 'id', 4, " +
      "sort => true, sort_also => 'v')")
    val comp = m()
    assert(comp.sortedFiles.values.toSet === Set("id,v"),
      "compact_bucketed(sort_also) records the composite order")
    Snapshots.commit((3000L until 3010L).map(i => (i, i.toDouble))
      .toDF("id", "v"), dir, "append")
    spark.sql("CALL graftcat.system.cluster_tail('db.ct', sort => true, " +
      "sort_also => 'v')")
    val compRepaired = m()
    assert(compRepaired.sortedFiles.keySet === compRepaired.files.toSet &&
      compRepaired.sortedFiles.values.toSet === Set("id,v"),
      "cluster_tail(sort_also) keeps the composite layout whole")
    assert(spark.table("graftcat.db.ct").count() === 370L)
    spark.sql("DROP TABLE graftcat.db.ct")
  }

  test("CALL graftcat.system.asof_join returns the Scala path's rows " +
    "row-for-row, defaults and named args included") {
    init()
    val s = spark
    import s.implicits._
    val lDir = s"$warehouse/db/asofl"
    val rDir = s"$warehouse/db/asofr"
    // left events at every tick; right quotes at even ticks only —
    // backward matches the last even tick at-or-before, forward the
    // next; keys 0..6, co-clustered 4 buckets
    Snapshots.commit(
      (0 until 200).map(i => (i.toLong % 7, i.toLong, s"L$i"))
        .toDF("k", "t", "ev"),
      lDir, "overwrite", bucketBy = Some(("k", 4)))
    Snapshots.commit(
      (0 until 90).map(i => (i.toLong % 7, (i * 2).toLong, s"R$i"))
        .toDF("rk", "rt", "quote"),
      rDir, "overwrite", bucketBy = Some(("rk", 4)))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val called = spark.sql("CALL graftcat.system.asof_join(" +
      "'db.asofl', 'db.asofr', 'k', 'rk', 't', 'rt')")
    val api = Snapshots.bucketAlignedAsof(spark, lDir, rDir,
      "k", "rk", "t", "rt")
    assert(called.schema.fieldNames.toSeq === api.schema.fieldNames.toSeq)
    val got = rows(called)
    assert(got.nonEmpty && got === rows(api),
      "CALL asof_join must match the Scala path row-for-row")
    // named args: forward direction + tolerance + inner
    val fwd = spark.sql("CALL graftcat.system.asof_join(" +
      "'db.asofl', 'db.asofr', 'k', 'rk', 't', 'rt', " +
      "join_type => 'inner', direction => 'forward', tolerance => 5)")
    val fwdApi = Snapshots.bucketAlignedAsof(spark, lDir, rDir,
      "k", "rk", "t", "rt", joinType = "inner", direction = "forward",
      tolerance = Some(5L))
    assert(rows(fwd) === rows(fwdApi))
    // the tolerance actually binds (inner drops out-of-tolerance rows)
    assert(fwd.count() < called.count())
    // refusals surface: unknown table
    intercept[Exception] {
      spark.sql("CALL graftcat.system.asof_join(" +
        "'db.nope', 'db.asofr', 'k', 'rk', 't', 'rt')").collect()
    }
    // the ROW BUDGET (VERDICT r17 weak #2): a CALL result past
    // graft.procedure.maxRows refuses loudly naming the Scala API —
    // the driver-local result scan must never materialize unbounded
    // rows; an under-budget CALL is unchanged row-for-row
    try {
      spark.conf.set("graft.procedure.maxRows", "50")
      val e = intercept[Exception] {
        spark.sql("CALL graftcat.system.asof_join(" +
          "'db.asofl', 'db.asofr', 'k', 'rk', 't', 'rt')").collect()
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).take(8).flatMap(t => Option(t.getMessage))
        .mkString("; ")
      assert(msgs.contains("graft.procedure.maxRows") &&
        msgs.contains("bucketAlignedAsof"), e.toString)
      spark.conf.set("graft.procedure.maxRows", "100000")
      assert(rows(spark.sql("CALL graftcat.system.asof_join(" +
        "'db.asofl', 'db.asofr', 'k', 'rk', 't', 'rt')")) === got,
        "an under-budget CALL must serve unchanged")
    } finally spark.conf.unset("graft.procedure.maxRows")
  }

  test("ALTER TABLE ALTER COLUMN TYPE widens losslessly, metadata-only") {
    init()
    spark.sql("DROP TABLE IF EXISTS graftcat.db.w1")
    spark.sql("CREATE TABLE graftcat.db.w1 USING graft AS " +
      "SELECT CAST(id AS INT) AS k, CAST(id AS FLOAT) AS x FROM RANGE(10)")
    spark.sql("ALTER TABLE graftcat.db.w1 ALTER COLUMN k TYPE BIGINT")
    spark.sql("ALTER TABLE graftcat.db.w1 ALTER COLUMN x TYPE DOUBLE")
    val t = spark.table("graftcat.db.w1")
    assert(t.schema("k").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(t.schema("x").dataType ===
      org.apache.spark.sql.types.DoubleType)
    // old int32/float files read through the widened schema in place
    assert(t.agg(sum("k")).head().getLong(0) === 45L)
    // and wide values now land
    spark.sql("INSERT INTO graftcat.db.w1 SELECT 9000000000, 0.5")
    assert(spark.table("graftcat.db.w1").count() === 11L)
    assert(spark.table("graftcat.db.w1").agg(max("k")).head().getLong(0) ===
      9000000000L)
    // a NON-widening change is refused
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graftcat.db.w1 ALTER COLUMN x TYPE STRING")
    }
    assert(e.getMessage.contains("not a lossless widening") ||
      Option(e.getCause).exists(_.getMessage.contains("not a lossless widening")),
      e.toString)
    spark.sql("DROP TABLE graftcat.db.w1")
  }

  test("readStream.table: name-based streaming read over the V1 source") {
    init()
    spark.sql("DROP TABLE IF EXISTS graftcat.db.ts1")
    spark.sql("CREATE TABLE graftcat.db.ts1 USING graft AS " +
      "SELECT id, CONCAT('x', id) AS tag FROM RANGE(20)")
    val dir = s"$warehouse/db/ts1"
    val stream = spark.readStream.table("graftcat.db.ts1")
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("cat_ts1")
      .option("checkpointLocation", graft.TempDirs.create("cat-ts1-ckpt"))
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("cat_ts1").count() === 20L)
      // commits by NAME arrive as micro-batches
      spark.sql("INSERT INTO graftcat.db.ts1 SELECT id + 100, 'late' FROM RANGE(5)")
      q.processAllAvailable()
      assert(q.exception.isEmpty, q.exception.toString)
    } finally q.stop()
    val got = spark.table("cat_ts1").select("id").collect()
      .map(_.getLong(0)).sorted
    val want = Snapshots.readVersion(spark, dir).select("id").collect()
      .map(_.getLong(0)).sorted
    assert(got === want)
    // changeFeed mode by name: _change_type-tagged, delete-aware
    val cdc = spark.readStream.option("changeFeed", "true")
      .table("graftcat.db.ts1")
    assert(cdc.schema.fieldNames.contains("_change_type"))
    val q2 = cdc.writeStream.format("memory").queryName("cat_ts1_cdc")
      .option("checkpointLocation", graft.TempDirs.create("cat-ts1-ckpt2"))
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      spark.sql("DELETE FROM graftcat.db.ts1 WHERE id = 3")
      q2.processAllAvailable()
      assert(q2.exception.isEmpty, q2.exception.toString)
    } finally q2.stop()
    assert(spark.table("cat_ts1_cdc")
      .filter(col("_change_type") === "delete").count() === 1L)
    spark.sql("DROP TABLE graftcat.db.ts1")
  }

  test("DataFrameWriterV2: writeTo(...).append/overwrite/createOrReplace by name") {
    init()
    spark.sql("DROP TABLE IF EXISTS graftcat.db.wt1")
    // createOrReplace routes through the (atomic) RTAS path
    spark.range(5).select(col("id"), lit("a").as("tag"))
      .writeTo("graftcat.db.wt1").createOrReplace()
    assert(spark.table("graftcat.db.wt1").count() === 5L)
    // append = one snapshot commit
    spark.range(3).select((col("id") + 100).as("id"), lit("b").as("tag"))
      .writeTo("graftcat.db.wt1").append()
    assert(spark.table("graftcat.db.wt1").count() === 8L)
    // overwritePartitions under STATIC mode = full overwrite on an
    // unpartitioned table; plain overwrite(true-cond) replaces too
    spark.range(2).select(col("id"), lit("c").as("tag"))
      .writeTo("graftcat.db.wt1").overwrite(lit(true))
    assert(spark.table("graftcat.db.wt1").count() === 2L)
    // history survived all three (createOrReplace = v0+v1, append,
    // overwrite): time travel still serves the appended state
    assert(spark.sql("SELECT COUNT(*) FROM graftcat.db.wt1 VERSION AS OF 2")
      .head().getLong(0) === 8L)
    spark.sql("DROP TABLE graftcat.db.wt1")
  }

  test("u34 demo is idempotent across bench passes (cached catalog instance)") {
    // Spark caches catalog instances by name: the demo must produce
    // identical rows on every in-JVM repetition (warm bench passes)
    val first = DemoFixtures.u34CatalogTable(spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).sorted
    val second = DemoFixtures.u34CatalogTable(spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).sorted
    assert(first.nonEmpty && first.sameElements(second))
  }

  test("errors: missing table, duplicate create, non-empty namespace drop") {
    init()
    intercept[Exception] { spark.table("graftcat.db.nope").collect() }
    spark.sql("CREATE TABLE graftcat.db.t4 (x INT) USING graft")
    intercept[Exception] {
      spark.sql("CREATE TABLE graftcat.db.t4 (x INT) USING graft")
    }
    intercept[Exception] { spark.sql("DROP NAMESPACE graftcat.db") }
    spark.sql("DROP TABLE graftcat.db.t4")
  }
}
