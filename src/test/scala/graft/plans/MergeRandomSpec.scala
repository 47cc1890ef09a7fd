package graft.plans

import graft.SparkSpec
import graft.sources.Snapshots
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized general-MERGE protocol check: random key-unique targets
  * and sources, random action sets (conditional matched UPDATE/DELETE
  * chains, NOT MATCHED INSERTs, NOT MATCHED BY SOURCE UPDATE/DELETE,
  * optional extra ON conjuncts), each statement executed through SQL
  * MERGE and replayed against a DataFrame-computed relational model
  * with first-match-wins semantics. Seeds are printed so a failure
  * reproduces.
  */
class MergeRandomSpec extends SparkSpec {

  private def view(name: String, dir: String): Unit =
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $name " +
      s"USING graft OPTIONS (path '$dir')")

  test("random MERGE statements == the relational first-match-wins model") {
    val seed = System.nanoTime()
    info(s"seed = $seed")
    val rnd = new Random(seed)
    val s = spark
    import s.implicits._

    for (round <- 1 to 8) {
      // ---- target: key-unique, two value columns ----
      val n = 40 + rnd.nextInt(60)
      val tRows = (0L until n).map(k =>
        (k, rnd.nextInt(100).toLong, if (rnd.nextBoolean()) "x" else "y"))
      val dir = graft.TempDirs.create(s"merge-rand-$round")
      Snapshots.commit(tRows.toDF("k", "v", "g"), dir, "overwrite",
        statsColumns = Seq("k"))
      view("mr_t", dir)

      // ---- source: overlap + fresh keys, key-unique ----
      val overlap = (0L until n).filter(_ => rnd.nextBoolean())
      val fresh = (0 until rnd.nextInt(20)).map(_ => 1000L + rnd.nextInt(500))
        .distinct
      val sRows = (overlap ++ fresh).map(k =>
        (k, rnd.nextInt(100).toLong, if (rnd.nextBoolean()) "x" else "y"))
      sRows.toDF("k", "sv", "sg").createOrReplaceTempView("mr_s")

      // ---- random statement shape ----
      val extraOn = rnd.nextInt(3) match {
        case 0 => "" // plain key equality
        case 1 => " AND t.g = s.sg" // target-source conjunct
        case 2 => " AND t.v < 80" // target-only conjunct
      }
      // SQL rule: within each clause family, only the LAST clause may
      // omit its condition — non-last draws always get one
      case class MAct(cond: Option[String], isDelete: Boolean,
                      setV: Option[String])
      val nMatched = rnd.nextInt(3)
      val matched = (0 until nMatched).map { i =>
        val cond = rnd.nextInt(3) match {
          case 0 if i == nMatched - 1 => None
          case 1 => Some(s"s.sv >= ${20 * (i + 1)}")
          case _ => Some(s"t.v % 2 = $i")
        }
        MAct(cond, rnd.nextBoolean(),
          Some(if (rnd.nextBoolean()) "s.sv" else "t.v + 1000"))
      }
      val hasInsert = rnd.nextBoolean()
      val nBySource = rnd.nextInt(3)
      val bySource = (0 until nBySource).map { i =>
        val cond =
          if (rnd.nextBoolean() && i == nBySource - 1) None
          else Some(s"t.v % 3 = $i")
        (cond, rnd.nextBoolean()) // (condition, isDelete)
      }
      if (matched.isEmpty && !hasInsert && bySource.isEmpty) {
        // zero clauses is not a statement; skip this draw
      } else {
        val clauses = new StringBuilder
        matched.foreach { a =>
          val c = a.cond.map(" AND " + _).getOrElse("")
          if (a.isDelete) clauses.append(s"\nWHEN MATCHED$c THEN DELETE")
          else clauses.append(
            s"\nWHEN MATCHED$c THEN UPDATE SET v = ${a.setV.get}, g = 'u'")
        }
        if (hasInsert) clauses.append(
          "\nWHEN NOT MATCHED THEN INSERT (k, v, g) VALUES (s.k, s.sv, 'i')")
        bySource.foreach { case (cond, isDelete) =>
          val c = cond.map(" AND " + _).getOrElse("")
          if (isDelete)
            clauses.append(s"\nWHEN NOT MATCHED BY SOURCE$c THEN DELETE")
          else clauses.append(
            s"\nWHEN NOT MATCHED BY SOURCE$c THEN UPDATE SET g = 'stale'")
        }
        val stmt = s"MERGE INTO mr_t t USING mr_s s ON t.k = s.k$extraOn" +
          clauses.toString

        // ---- the relational model (first-match-wins) ----
        val t0 = tRows.toDF("k", "v", "g")
        val s0 = sRows.toDF("k", "sv", "sg")
        val joined = t0.join(s0, Seq("k"), "full_outer")
          .select(col("k"), col("v"), col("g"), col("sv"), col("sg"),
            t0("k").isNotNull.as("inT"), s0("k").isNotNull.as("inS"))
        val onExtra: org.apache.spark.sql.Column = extraOn match {
          case "" => lit(true)
          case x if x.contains("t.g = s.sg") => col("g") === col("sg")
          case _ => col("v") < 80
        }
        val isMatched = col("inT") && col("inS") && coalesce(onExtra, lit(false))
        def actCond(c: Option[String]): org.apache.spark.sql.Column = c match {
          case None => lit(true)
          case Some(x) if x.startsWith("s.sv >=") =>
            col("sv") >= x.stripPrefix("s.sv >= ").trim.toLong
          case Some(x) if x.startsWith("t.v % 2") =>
            col("v") % 2 === x.stripPrefix("t.v % 2 = ").trim.toLong
          case Some(x) => // t.v % 3 = i (by-source)
            col("v") % 3 === x.stripPrefix("t.v % 3 = ").trim.toLong
        }
        // first matching action index for the source-driven side
        val mActIdx = matched.zipWithIndex.foldLeft(lit(-1)) {
          case (acc, (a, i)) =>
            when(acc =!= -1, acc)
              .otherwise(when(isMatched && coalesce(actCond(a.cond),
                lit(false)), lit(i)).otherwise(lit(-1)))
        }
        val bsActIdx = bySource.zipWithIndex.foldLeft(lit(-1)) {
          case (acc, ((c, _), i)) =>
            when(acc =!= -1, acc)
              .otherwise(when(col("inT") && !isMatched &&
                coalesce(actCond(c), lit(false)), lit(i)).otherwise(lit(-1)))
        }
        // model rows: per joined row decide survival + values
        val model = joined
          .withColumn("__m", mActIdx)
          .withColumn("__bs", bsActIdx)
        def updValue(i: Int): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
          val a = matched(i)
          val v = a.setV.get match {
            case "s.sv" => col("sv")
            case _ => col("v") + 1000
          }
          (v, lit("u"))
        }
        // target-row outcomes
        val tOut = {
          var vCol: org.apache.spark.sql.Column = col("v")
          var gCol: org.apache.spark.sql.Column = col("g")
          var deleted: org.apache.spark.sql.Column = lit(false)
          matched.zipWithIndex.foreach { case (a, i) =>
            if (a.isDelete) deleted = when(col("__m") === i, true).otherwise(deleted)
            else {
              val (v2, g2) = updValue(i)
              vCol = when(col("__m") === i, v2).otherwise(vCol)
              gCol = when(col("__m") === i, g2).otherwise(gCol)
            }
          }
          bySource.zipWithIndex.foreach { case ((_, isDelete), i) =>
            if (isDelete) deleted = when(col("__bs") === i, true).otherwise(deleted)
            else gCol = when(col("__bs") === i, lit("stale")).otherwise(gCol)
          }
          model.filter(col("inT") && !deleted)
            .select(col("k"), vCol.as("v"), gCol.as("g"))
        }
        // insert outcomes: source rows not matched (and, per the
        // layer's key-unique upsert contract, a not-matched-by-ON row
        // whose KEY exists replaces the target row — exclude the
        // original in that case). With extra ON conjuncts the INSERT
        // upserts; the model mirrors that by preferring the insert row.
        val iOut =
          if (!hasInsert) spark.emptyDataFrame
            .select(lit(0L).as("k"), lit(0L).as("v"), lit("").as("g")).limit(0)
          else model.filter(col("inS") && !isMatched)
            .select(col("k"), col("sv").as("v"), lit("i").as("g"))
        val expected =
          if (!hasInsert) tOut
          else tOut.join(iOut.select(col("k")), Seq("k"), "left_anti")
            .unionByName(iOut)

        // one statement shape is UNREPRESENTABLE under the layer's
        // key-unique contract: a BY SOURCE UPDATE and an INSERT
        // landing on the SAME key (extra-ON-false pair) would need
        // two surviving rows under one key — the command refuses it
        // with the cardinality error (a BY SOURCE DELETE + INSERT
        // pair instead collapses to the net insert, which the model
        // covers via the anti-join above)
        val bsUpdateIdx = bySource.zipWithIndex.collect {
          case ((_, false), i) => i }.toSet
        val conflict = hasInsert && bsUpdateIdx.nonEmpty &&
          model.filter(col("inS") && !isMatched && col("inT") &&
            col("__bs").isin(bsUpdateIdx.toSeq.map(x => x: Any): _*))
            .limit(1).count() > 0
        if (conflict) {
          val e = intercept[Exception] { spark.sql(stmt) }
          assert(e.getMessage.contains("more than one change"),
            s"round $round seed $seed expected cardinality refusal:\n$stmt\n$e")
        } else {
          spark.sql(stmt)
          view("mr_t2", dir)
          val got = spark.table("mr_t2").select("k", "v", "g")
          val diff1 = got.exceptAll(expected).collect()
          val diff2 = expected.exceptAll(got).collect()
          assert(diff1.isEmpty && diff2.isEmpty,
            s"round $round seed $seed stmt:\n$stmt\n" +
              s"got-extra: ${diff1.take(5).mkString(",")}\n" +
              s"want-extra: ${diff2.take(5).mkString(",")}")
        }
      }
    }
  }

  test("BY SOURCE with duplicate source keys fires per TARGET ROW, not per pair") {
    val s = spark
    import s.implicits._
    val dir = graft.TempDirs.create("merge-dup-src")
    Snapshots.commit(
      Seq((1L, 10L, "x"), (2L, 20L, "x"), (3L, 30L, "x")).toDF("k", "v", "g"),
      dir, "overwrite", statsColumns = Seq("k"))
    view("md_t", dir)
    // key 1 has TWO source rows: one satisfying the extra ON conjunct
    // (tag='A'), one not — SQL says key 1 IS matched, so BY SOURCE
    // must not touch it even though the matched guard (tag='Z')
    // excludes it from any update. Key 2's only source row fails the
    // conjunct; key 3 has two rows both failing it (the per-pair bug's
    // OTHER face: two pairs would emit the delete twice and trip the
    // cardinality refusal spuriously).
    Seq((1L, "A"), (1L, "B"), (2L, "B"), (3L, "B"), (3L, "C"))
      .toDF("sk", "tag").createOrReplaceTempView("md_s")
    spark.sql(
      """MERGE INTO md_t t USING md_s s ON t.k = s.sk AND s.tag = 'A'
        |WHEN MATCHED AND s.tag = 'Z' THEN UPDATE SET g = 'm'
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    view("md_t2", dir)
    assert(spark.table("md_t2").select("k", "v", "g").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))) ==
      Seq((1L, 10L, "x")))
  }

  test("random BY SOURCE statements over duplicate-key sources == any-ON-true model") {
    val seed = System.nanoTime()
    info(s"seed = $seed")
    val rnd = new Random(seed)
    val s = spark
    import s.implicits._
    for (round <- 1 to 6) {
      val n = 30 + rnd.nextInt(40)
      val tRows = (0L until n).map(k =>
        (k, rnd.nextInt(100).toLong, if (rnd.nextBoolean()) "x" else "y"))
      val dir = graft.TempDirs.create(s"merge-dup-rand-$round")
      Snapshots.commit(tRows.toDF("k", "v", "g"), dir, "overwrite",
        statsColumns = Seq("k"))
      view("mdr_t", dir)
      // duplicate keys ON PURPOSE: 1–3 source rows per drawn key, each
      // with its own group tag, so "matched" means ANY row satisfies ON
      val sRows = (0L until n).filter(_ => rnd.nextBoolean()).flatMap { k =>
        (0 to rnd.nextInt(3)).map(_ =>
          (k, if (rnd.nextBoolean()) "x" else "y"))
      }
      if (sRows.nonEmpty) {
        sRows.toDF("sk", "sg").createOrReplaceTempView("mdr_s")
        val nBs = 1 + rnd.nextInt(2)
        val bySource = (0 until nBs).map { i =>
          val cond =
            if (i == nBs - 1 && rnd.nextBoolean()) None
            else Some(s"t.v % 3 = $i")
          (cond, rnd.nextBoolean())
        }
        val clauses = bySource.map { case (cond, isDelete) =>
          val c = cond.map(" AND " + _).getOrElse("")
          if (isDelete) s"\nWHEN NOT MATCHED BY SOURCE$c THEN DELETE"
          else s"\nWHEN NOT MATCHED BY SOURCE$c THEN UPDATE SET g = 'stale'"
        }.mkString
        val stmt =
          s"MERGE INTO mdr_t t USING mdr_s s ON t.k = s.sk AND t.g = s.sg" +
            clauses

        // model: a target row is matched iff ANY source row satisfies
        // the full ON; unmatched rows take the FIRST true BY SOURCE
        // action (conditions are target-only)
        val t0 = tRows.toDF("k", "v", "g")
        val s0 = sRows.toDF("sk", "sg")
        val matched = t0.join(s0,
          col("k") === col("sk") && col("g") === col("sg"), "left_semi")
        val unmatched = t0.join(s0,
          col("k") === col("sk") && col("g") === col("sg"), "left_anti")
        val bsIdx = bySource.zipWithIndex.foldLeft(lit(-1)) {
          case (acc, ((c, _), i)) =>
            val fires = c match {
              case None => lit(true)
              case Some(x) =>
                col("v") % 3 === x.stripPrefix("t.v % 3 = ").trim.toLong
            }
            when(acc =!= -1, acc).otherwise(
              when(fires, lit(i)).otherwise(lit(-1)))
        }
        var gCol: org.apache.spark.sql.Column = col("g")
        var deleted: org.apache.spark.sql.Column = lit(false)
        bySource.zipWithIndex.foreach { case ((_, isDelete), i) =>
          if (isDelete) deleted = when(bsIdx === i, true).otherwise(deleted)
          else gCol = when(bsIdx === i, lit("stale")).otherwise(gCol)
        }
        val expected = matched.unionByName(
          unmatched.filter(!deleted).select(col("k"), col("v"), gCol.as("g")))

        spark.sql(stmt)
        view("mdr_t2", dir)
        val got = spark.table("mdr_t2").select("k", "v", "g")
        val diff1 = got.exceptAll(expected).collect()
        val diff2 = expected.exceptAll(got).collect()
        assert(diff1.isEmpty && diff2.isEmpty,
          s"round $round seed $seed stmt:\n$stmt\n" +
            s"got-extra: ${diff1.take(5).mkString(",")}\n" +
            s"want-extra: ${diff2.take(5).mkString(",")}")
      }
    }
  }
}
