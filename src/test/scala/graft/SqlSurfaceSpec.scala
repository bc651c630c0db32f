package graft

import graft.sql.GraftSql
import org.apache.spark.sql.functions._

/** The SQL command surface (graft.sql.GraftSqlParser via GraftExtensions):
  * every maintenance verb as a `spark.sql(...)` statement, with the stock
  * parser still serving everything else.
  */
class SqlSurfaceSpec extends SparkSuite {

  private lazy val sql = GraftSql.enable(spark)

  private def seeded(): (String, org.apache.spark.sql.DataFrame) = {
    val d = tempDir("sqlsurface")
    val df = spark.read.parquet(s"$sfDir/nation.parquet")
    DeltaTable.forPath(d).write(df).write(df)
    (d, df)
  }

  test("delegation: plain SQL still parses and runs in the enabled session") {
    assert(sql.sql("SELECT 1 + 1 AS two").collect().head.getInt(0) == 2)
    // and graft functions are registered in the same session
    val r = sql.sql("SELECT md5_prefix60('x') AS h").collect().head.getLong(0)
    assert(r > 0L)
  }

  test("DESCRIBE HISTORY returns the commit log newest-first") {
    val (d, _) = seeded()
    val rows = sql.sql(s"DESCRIBE HISTORY '$d'")
      .select("version", "operation").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 0L))
    assert(rows.last.getString(1) == "CREATE TABLE")
    assert(rows.head.getString(1) == "WRITE")
    // the delta-spark address spelling resolves to the same table
    val alt = sql.sql(s"DESCRIBE HISTORY delta.`$d`").count()
    assert(alt == 2)
  }

  test("DESCRIBE DETAIL is one metadata row with live file stats") {
    val (d, df) = seeded()
    val r = sql.sql(s"DESCRIBE DETAIL '$d'").collect().head
    assert(r.getAs[String]("format") == "graft")
    assert(r.getAs[Long]("numFiles") >= 1L)
    assert(r.getAs[String]("location").contains(d))
  }

  test("OPTIMIZE compacts; ZORDER BY lays out by the given columns") {
    val (d, df) = seeded()
    val r = sql.sql(s"OPTIMIZE '$d'").collect().head
    assert(r.getAs[Long]("numFilesBefore") >= r.getAs[Long]("numFilesAfter"))
    assert(DeltaTable.forPath(d).toDF(spark).count() == 2 * df.count())
    // zorder spelling parses and rewrites (2 dims => morton path)
    val d2 = tempDir("sqlsurface-z")
    DeltaTable.forPath(d2).write(
      spark.read.parquet(s"$sfDir/lineitem.parquet"))
    sql.sql(s"OPTIMIZE '$d2' ZORDER BY (l_orderkey, l_partkey)")
    assert(DeltaTable.forPath(d2).history.head._2.operation == "OPTIMIZE")
  }

  test("OPTIMIZE WHERE restricts the rewrite to matching partitions") {
    val d = tempDir("sqlsurface-w")
    val df = spark.read.parquet(s"$sfDir/nation.parquet")
    DeltaTable.forPath(d)
      .write(df, partitionBy = Some(Seq("n_regionkey")))
      .write(df)
    val before = DeltaTable.forPath(d).dlog.addActions.keySet
    sql.sql(s"OPTIMIZE '$d' WHERE n_regionkey = 1")
    val after = DeltaTable.forPath(d)
    // untouched partitions keep their files; data intact
    assert(after.dlog.addActions.keySet.intersect(before).nonEmpty)
    assert(!after.dlog.addActions.keySet.sameElements(before))
    assertSameRows(after.toDF(spark), df.union(df))
  }

  test("VACUUM DRY RUN lists but keeps; VACUUM RETAIN 0 HOURS reclaims") {
    val (d, _) = seeded()
    sql.sql(s"OPTIMIZE '$d'")
    val dry = sql.sql(s"VACUUM '$d' DRY RUN").collect()
    // default retention (7d): nothing old enough, dry or not
    assert(dry.isEmpty)
    def asFile(uri: String) =
      new java.io.File(uri.replaceFirst("^file:(//)?", ""))
    val dry0 = sql.sql(s"VACUUM '$d' RETAIN 0 HOURS DRY RUN").collect()
    assert(dry0.nonEmpty)
    assert(dry0.forall(r => asFile(r.getString(0)).exists()))
    val gone = sql.sql(s"VACUUM '$d' RETAIN 0 HOURS").collect()
    assert(gone.map(_.getString(0)).sorted.sameElements(
      dry0.map(_.getString(0)).sorted))
    assert(gone.forall(r => !asFile(r.getString(0)).exists()))
  }

  test("RESTORE TO VERSION AS OF rewinds; TIMESTAMP AS OF resolves") {
    val (d, df) = seeded()
    val r = sql.sql(s"RESTORE '$d' TO VERSION AS OF 0").collect().head
    assert(r.getAs[Long]("restoredVersion") == 0L)
    assert(DeltaTable.forPath(d).toDF(spark).count() == df.count())
    // timestamp form: restore forward to the v1 state by its commit time
    val t1 = DeltaTable.forPath(d).history.find(_._1 == 1L).get._2.effectiveTimestamp
    val ts = new java.sql.Timestamp(t1).toString
    sql.sql(s"RESTORE TABLE '$d' TO TIMESTAMP AS OF '$ts'")
    assert(DeltaTable.forPath(d).toDF(spark).count() == 2 * df.count())
  }

  test("SHOW PARTITIONS lists hive-shaped tuples from the log; unpartitioned refused") {
    val d = tempDir("sqlsurface-parts")
    val df = spark.read.parquet(s"$sfDir/nation.parquet")
    DeltaTable.forPath(d).write(df, partitionBy = Some(Seq("n_regionkey")))
    val parts = sql.sql(s"SHOW PARTITIONS '$d'").collect().map(_.getString(0))
    assert(parts.sameElements((0 to 4).map(r => s"n_regionkey=$r")), parts.mkString(","))
    val (flat, _) = seeded()
    val ex = intercept[Exception](sql.sql(s"SHOW PARTITIONS '$flat'").collect())
    assert(ex.getMessage.contains("not a partitioned table"), ex.getMessage)
  }

  test("SELECT over graft.`path` resolves, time-travels and joins") {
    val (d, df) = seeded()
    val n = df.count()
    assert(sql.sql(s"SELECT count(*) AS n FROM graft.`$d`")
      .collect().head.getLong(0) == 2 * n)
    // delta-spark spelling resolves identically
    assert(sql.sql(s"SELECT count(*) FROM delta.`$d`")
      .collect().head.getLong(0) == 2 * n)
    // Spark's own time-travel syntax maps to log replay
    assert(sql.sql(s"SELECT count(*) FROM graft.`$d` VERSION AS OF 0")
      .collect().head.getLong(0) == n)
    val t1 = DeltaTable.forPath(d).history.find(_._1 == 1L).get._2.effectiveTimestamp
    val ts = new java.sql.Timestamp(t1).toString
    assert(sql.sql(s"SELECT count(*) FROM graft.`$d` TIMESTAMP AS OF '$ts'")
      .collect().head.getLong(0) == 2 * n)
    // a join of two path tables analyzes like any relation
    val joined = sql.sql(
      s"""SELECT count(*) FROM graft.`$d` a
         |JOIN (SELECT DISTINCT n_regionkey FROM graft.`$d` VERSION AS OF 0) b
         |ON a.n_regionkey = b.n_regionkey""".stripMargin)
      .collect().head.getLong(0)
    assert(joined == 2 * n)
    // a log-less path falls through unresolved and fails analysis loudly
    // (Spark's own SQL-on-file rule names the source) — never a silent
    // empty relation
    val ex = intercept[Exception](
      sql.sql(s"SELECT * FROM graft.`${tempDir("nolog")}`").collect())
    assert(ex.getMessage.toLowerCase.contains("graft"), ex.getMessage)
  }

  test("INSERT INTO/OVERWRITE a graft path table commits through the log") {
    val d = tempDir("sqlsurface-insert")
    val src = tempDir("sqlsurface-insert-src")
    DeltaTable.forPath(src).write(
      spark.read.parquet(s"$sfDir/nation.parquet"))
    // create-on-first-insert, then append, then overwrite — every one a
    // log commit, never bare files in the table dir
    sql.sql(s"INSERT INTO graft.`$d` SELECT * FROM graft.`$src` WHERE n_nationkey < 10")
    sql.sql(s"INSERT INTO graft.`$d` SELECT * FROM graft.`$src` WHERE n_nationkey >= 10")
    val t = DeltaTable.forPath(d)
    assert(t.toDF(spark).count() == 25)
    assert(t.history.map(_._2.operation).toSet == Set("CREATE TABLE", "WRITE"))
    // every data file is log-tracked: no strays from a raw parquet write
    val live = t.dlog.addActions.keySet
    val onDisk = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(onDisk.subsetOf(live), s"untracked files: ${onDisk -- live}")
    sql.sql(s"INSERT OVERWRITE graft.`$d` SELECT * FROM graft.`$src` WHERE n_nationkey = 0")
    assert(DeltaTable.forPath(d).toDF(spark).count() == 1)
    // unsupported shapes refuse loudly instead of planning a raw write
    val ex = intercept[Exception](sql.sql(
      s"INSERT INTO graft.`$d` PARTITION (n_regionkey=1) SELECT * FROM graft.`$src`"))
    assert(ex.getMessage.contains("no PARTITION spec"), ex.getMessage)
  }

  test("DELETE FROM and UPDATE ... SET commit copy-on-write through the log") {
    val d = tempDir("sqlsurface-dml")
    DeltaTable.forPath(d).write(spark.read.parquet(s"$sfDir/nation.parquet"))
    sql.sql(s"DELETE FROM graft.`$d` WHERE n_nationkey >= 20")
    assert(DeltaTable.forPath(d).toDF(spark).count() == 20)
    // SET exprs with nested commas parse whole; unqualified columns bind
    sql.sql(s"UPDATE '$d' SET n_name = concat(n_name, '!'), " +
      "n_regionkey = greatest(n_regionkey, 1) WHERE n_nationkey < 5")
    val t = DeltaTable.forPath(d)
    assert(t.history.map(_._2.operation).take(2) == Seq("UPDATE", "DELETE"))
    val r = t.toDF(spark).filter(col("n_nationkey") === 0).head()
    assert(r.getAs[String]("n_name").endsWith("!"))
    assert(r.getAs[Number]("n_regionkey").longValue >= 1L)
    assert(t.toDF(spark).filter(col("n_name").endsWith("!")).count() == 5)
    // catalog-shaped DML never routes here: the stock parser still owns it
    val ex = intercept[Exception](
      sql.sql("DELETE FROM some_catalog_table WHERE x = 1").collect())
    assert(!ex.getMessage.contains("graft"), ex.getMessage)
  }

  test("SQL SELECT over a path table keeps filter/projection pushdown") {
    val d = tempDir("sqlsurface-pushdown")
    DeltaTable.forPath(d).write(
      spark.read.parquet(s"$sfDir/lineitem.parquet"))
    val plan = sql.sql(
      s"SELECT l_orderkey, l_quantity FROM graft.`$d` WHERE l_orderkey < 100")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    // the predicate must reach the parquet scan, and the scan must read
    // only the projected columns — the SQL route pays no pushdown tax
    // over the DataFrame route
    assert(plan.contains("PushedFilters") &&
      plan.contains("LessThan(l_orderkey,100)"), plan.take(2000))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity")
      && !readSchema.contains("l_extendedprice"), readSchema)
  }

  // ---- MERGE INTO clause matrix (X181) ----

  private def mergeFixture(): (String, String) = {
    val d = tempDir("sqlsurface-merge-t")
    val s = tempDir("sqlsurface-merge-s")
    DeltaTable.forPath(d).write(spark.read.parquet(s"$sfDir/nation.parquet"))
    // source: updates for keys 0-9 (renamed key!), deletes for 20-24,
    // inserts for 100-102
    val src = spark.range(0, 10)
      .select(col("id").cast("int").as("nk"), lit("upd").as("op"),
        lit(7).as("newreg"))
      .union(spark.range(20, 25).select(col("id").cast("int"),
        lit("del"), lit(0)))
      .union(spark.range(100, 103).select(col("id").cast("int"),
        lit("ins"), lit(9)))
    DeltaTable.forPath(s).write(src)
    (d, s)
  }

  test("MERGE INTO: DELETE + UPDATE + INSERT clauses in one statement") {
    val (d, s) = mergeFixture()
    sql.sql(
      s"""MERGE INTO graft.`$d` t USING graft.`$s` s
         |ON t.n_nationkey = s.nk
         |WHEN MATCHED AND s.op = 'del' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET n_regionkey = s.newreg
         |WHEN NOT MATCHED THEN INSERT (n_nationkey, n_name, n_regionkey)
         |  VALUES (s.nk, concat('new-', s.op), s.newreg)""".stripMargin)
    val t = DeltaTable.forPath(d).toDF(spark)
    assert(t.count() == 23) // 25 - 5 deleted + 3 inserted
    assert(t.filter(col("n_regionkey") === 7).count() == 10)
    assert(t.filter(col("n_nationkey") >= 20 && col("n_nationkey") < 100)
      .count() == 0)
    assert(t.filter(col("n_name") === "new-ins").count() == 3)
    assert(DeltaTable.forPath(d).history.head._2.operation == "MERGE")
    // every data file is log-tracked (live or tombstoned) — the
    // no-strays corruption guard: a raw write would be in neither set
    val dlog = DeltaTable.forPath(d).dlog
    val tracked = dlog.addActions.keySet ++
      dlog.entries.values.flatMap(_.removes).map(_.path)
    val onDisk = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(onDisk.subsetOf(tracked), s"untracked files: ${onDisk -- tracked}")
  }

  test("MERGE INTO whole-row: UPDATE SET * / INSERT * / NMBS DELETE") {
    val d = tempDir("sqlsurface-merge-star")
    val s = tempDir("sqlsurface-merge-star-s")
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    DeltaTable.forPath(d).write(nation)
    // whole-row source: keys 0-9 with bumped region, plus key 100
    DeltaTable.forPath(s).write(
      nation.filter(col("n_nationkey") < 10)
        .withColumn("n_regionkey", col("n_regionkey") + 100)
        .union(nation.filter(col("n_nationkey") === 0)
          .withColumn("n_nationkey", lit(100))))
    sql.sql(
      s"""MERGE INTO graft.`$d` t USING graft.`$s` s
         |ON t.n_nationkey = s.n_nationkey
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE AND t.n_nationkey >= 20 THEN DELETE""".stripMargin)
    val t = DeltaTable.forPath(d).toDF(spark)
    assert(t.count() == 21) // 25 matched/kept - 5 NMBS-deleted + 1 inserted
    assert(t.filter(col("n_regionkey") >= 100).count() == 10)
    assert(t.filter(col("n_nationkey") === 100).count() == 1)
    assert(t.filter(col("n_nationkey") >= 20 && col("n_nationkey") < 100)
      .count() == 0)
  }

  test("MERGE INTO: UPDATE before DELETE shields rows its condition matches") {
    val (d, s) = mergeFixture()
    // delta's first-clause-wins: nk<5 updates even though the DELETE's
    // condition (op in upd/del) would also match it
    sql.sql(
      s"""MERGE INTO graft.`$d` t USING graft.`$s` s
         |ON t.n_nationkey = s.nk
         |WHEN MATCHED AND s.nk < 5 THEN UPDATE SET n_regionkey = s.newreg
         |WHEN MATCHED THEN DELETE""".stripMargin)
    val t = DeltaTable.forPath(d).toDF(spark)
    // 25 - (matched 15, of which 5 shielded+updated, 10 deleted)
    assert(t.count() == 15)
    assert(t.filter(col("n_regionkey") === 7).count() == 5)
    assert(t.filter(col("n_nationkey") >= 5 && col("n_nationkey") < 10)
      .count() == 0)
  }

  test("MERGE INTO: INSERT-only is insert-if-absent; DELETE-only a keyed delete") {
    val (d, s) = mergeFixture()
    sql.sql(
      s"""MERGE INTO graft.`$d` t USING graft.`$s` s
         |ON t.n_nationkey = s.nk
         |WHEN NOT MATCHED THEN INSERT (n_nationkey, n_name, n_regionkey)
         |  VALUES (s.nk, 'inserted', s.newreg)""".stripMargin)
    val afterInsert = DeltaTable.forPath(d)
    assert(afterInsert.toDF(spark).count() == 28)
    // insert-only merge rewrites nothing: only the 0-24 create file plus
    // the inserted file are live
    assert(afterInsert.toDF(spark).filter(col("n_name") === "inserted")
      .count() == 3)
    sql.sql(
      s"""MERGE INTO graft.`$d` t USING graft.`$s` s
         |ON t.n_nationkey = s.nk
         |WHEN MATCHED AND s.op = 'del' THEN DELETE""".stripMargin)
    val afterDelete = DeltaTable.forPath(d).toDF(spark)
    assert(afterDelete.count() == 23)
    assert(afterDelete.filter(col("n_nationkey") >= 20 &&
      col("n_nationkey") < 100).count() == 0)
  }

  test("MERGE INTO: unsupported shapes refuse loudly") {
    val (d, s) = mergeFixture()
    def bad(stmt: String, needle: String): Unit = {
      val ex = intercept[Exception](sql.sql(stmt))
      assert(ex.getMessage.contains(needle), ex.getMessage)
    }
    bad(s"""MERGE INTO graft.`$d` t USING graft.`$s` s
           |ON t.n_nationkey = s.nk
           |WHEN NOT MATCHED AND s.op = 'ins' THEN INSERT
           |  (n_nationkey, n_name, n_regionkey) VALUES (s.nk, 'x', 1)""".stripMargin,
      "conditional WHEN NOT MATCHED INSERT")
    bad(s"""MERGE INTO graft.`$d` t USING graft.`$s` s
           |ON t.n_nationkey = s.nk
           |WHEN MATCHED THEN UPDATE SET n_regionkey = s.newreg
           |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin,
      "whole-row")
    bad(s"""MERGE INTO graft.`$d` t USING graft.`$s` s
           |ON t.n_nationkey < s.nk
           |WHEN MATCHED THEN DELETE""".stripMargin,
      "equality conjuncts")
    // catalog-shaped MERGE never routes here
    val ex = intercept[Exception](sql.sql(
      s"""MERGE INTO some_catalog_table t USING graft.`$s` s
         |ON t.k = s.nk WHEN MATCHED THEN DELETE""".stripMargin).collect())
    assert(!ex.getMessage.contains("graft path"), ex.getMessage)
  }

  // ---- ALTER TABLE family (X183) ----

  test("ALTER TABLE: ADD COLUMNS / SET-UNSET TBLPROPERTIES / RENAME / DROP / TYPE") {
    val d = tempDir("sqlsurface-alter")
    DeltaTable.forPath(d).write(spark.read.parquet(s"$sfDir/nation.parquet"))
    // ADD COLUMNS: metadata-only, existing rows null-fill; COMMENT + AFTER
    sql.sql(s"ALTER TABLE graft.`$d` ADD COLUMNS (score DOUBLE, " +
      "tag STRING COMMENT 'quality tag' AFTER n_name)")
    val t1 = DeltaTable.forPath(d)
    assert(t1.schema.fieldNames.toSeq ==
      Seq("n_nationkey", "n_name", "tag", "n_regionkey", "score"))
    assert(t1.schema("tag").metadata.getString("comment") == "quality tag")
    assert(t1.toDF(spark).filter(col("score").isNull).count() == 25)
    // SET / UNSET TBLPROPERTIES (the widening gate rides the same verb)
    sql.sql(s"ALTER TABLE '$d' SET TBLPROPERTIES " +
      "('graft.owner' = 'pipeline', 'delta.enableTypeWidening' = 'true')")
    assert(DeltaTable.forPath(d).tableProperties("graft.owner") == "pipeline")
    sql.sql(s"ALTER TABLE '$d' UNSET TBLPROPERTIES ('graft.owner')")
    assert(!DeltaTable.forPath(d).tableProperties.contains("graft.owner"))
    // ALTER COLUMN TYPE: lossless widening only
    sql.sql(s"ALTER TABLE graft.`$d` ALTER COLUMN n_regionkey TYPE BIGINT")
    assert(DeltaTable.forPath(d).schema("n_regionkey").dataType ==
      org.apache.spark.sql.types.LongType)
    val exNarrow = intercept[Exception](sql.sql(
      s"ALTER TABLE graft.`$d` ALTER COLUMN n_regionkey TYPE INT"))
    assert(exNarrow.getMessage.toLowerCase.contains("widen"), exNarrow.getMessage)
    // RENAME (self-enables name-mode mapping) + DROP: metadata-only
    sql.sql(s"ALTER TABLE graft.`$d` RENAME COLUMN n_name TO nation_name")
    sql.sql(s"ALTER TABLE graft.`$d` DROP COLUMN tag")
    val t2 = DeltaTable.forPath(d)
    assert(t2.schema.fieldNames.toSeq ==
      Seq("n_nationkey", "nation_name", "n_regionkey", "score"))
    // data still reads through the mapping (physical files untouched)
    assert(t2.toDF(spark).filter(col("nation_name").isNotNull).count() == 25)
    // every step was a commit through the log
    assert(DeltaTable.forPath(d).history.length == 8)
  }

  // ---- CREATE TABLE / CTAS / CLONE / SHOW TBLPROPERTIES / DESCRIBE (X187/X188) ----

  test("CREATE TABLE: schema-only create, then INSERT through the log") {
    val d = tempDir("sqlsurface-create")
    val r = sql.sql(s"CREATE TABLE graft.`$d` (id BIGINT, name STRING " +
      "COMMENT 'label', amount DECIMAL(10,2)) PARTITIONED BY (name) " +
      "TBLPROPERTIES ('graft.kind' = 'ledger')").collect().head
    assert(r.getString(0) == d)
    val t = DeltaTable.forPath(d)
    assert(t.toDF(spark).count() == 0)
    assert(t.schema.fieldNames.toSeq == Seq("id", "name", "amount"))
    assert(t.schema("amount").dataType ==
      org.apache.spark.sql.types.DecimalType(10, 2))
    assert(t.schema("name").metadata.getString("comment") == "label")
    assert(t.dlog.partitionColumns == Seq("name"))
    assert(t.tableProperties("graft.kind") == "ledger")
    // the empty create is a real table: inserts land through the log
    sql.sql(s"INSERT INTO graft.`$d` SELECT CAST(1 AS BIGINT), 'a', " +
      "CAST(2.50 AS DECIMAL(10,2))")
    assert(DeltaTable.forPath(d).toDF(spark).count() == 1)
    // plain CREATE on an existing table refuses; IF NOT EXISTS no-ops
    intercept[Exception](sql.sql(s"CREATE TABLE graft.`$d` (x INT)"))
    sql.sql(s"CREATE TABLE IF NOT EXISTS graft.`$d` (x INT)")
    assert(DeltaTable.forPath(d).schema.fieldNames.toSeq ==
      Seq("id", "name", "amount"))
  }

  test("CTAS and CREATE OR REPLACE ... AS SELECT commit atomically") {
    val d = tempDir("sqlsurface-ctas")
    val src = tempDir("sqlsurface-ctas-src")
    DeltaTable.forPath(src).write(spark.read.parquet(s"$sfDir/nation.parquet"))
    sql.sql(s"CREATE TABLE graft.`$d` USING graft PARTITIONED BY (n_regionkey) " +
      s"AS SELECT * FROM graft.`$src` WHERE n_nationkey < 10")
    val t = DeltaTable.forPath(d)
    assert(t.toDF(spark).count() == 10)
    assert(t.dlog.partitionColumns == Seq("n_regionkey"))
    sql.sql(s"CREATE OR REPLACE TABLE graft.`$d` AS SELECT * FROM " +
      s"graft.`$src` WHERE n_nationkey >= 20")
    val t2 = DeltaTable.forPath(d)
    assert(t2.toDF(spark).count() == 5)
    // the replace is one overwrite commit; prior state stays time-travelable
    assert(t2.loadAsVersion(0L).toDF(spark).count() == 10)
  }

  test("SHALLOW/DEEP CLONE with VERSION AS OF; SHOW TBLPROPERTIES; DESCRIBE") {
    val src = tempDir("sqlsurface-clone-src")
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    DeltaTable.forPath(src).write(nation).write(nation)
      .setTableProperties(Map("graft.team" -> "data"))
    // shallow clone pinned at v0 carries only the first append
    val sh = tempDir("sqlsurface-clone-sh")
    sql.sql(s"CREATE TABLE graft.`$sh` SHALLOW CLONE graft.`$src` VERSION AS OF 0")
    val shT = DeltaTable.forPath(sh)
    assert(shT.version == 0L)
    assert(shT.toDF(spark).count() == 25)
    // deep clone owns its bytes: fresh v0, full current rows
    val dp = tempDir("sqlsurface-clone-dp")
    sql.sql(s"CREATE TABLE graft.`$dp` DEEP CLONE graft.`$src`")
    val dpT = DeltaTable.forPath(dp)
    assert(dpT.version == 0L)
    assert(dpT.toDF(spark).count() == 50)
    // existing target refuses; IF NOT EXISTS no-ops
    intercept[Exception](
      sql.sql(s"CREATE TABLE graft.`$dp` SHALLOW CLONE graft.`$src`"))
    sql.sql(s"CREATE TABLE IF NOT EXISTS graft.`$dp` SHALLOW CLONE graft.`$src`")
    assert(DeltaTable.forPath(dp).toDF(spark).count() == 50)
    // SHOW TBLPROPERTIES reads the log's configuration
    val props = sql.sql(s"SHOW TBLPROPERTIES '$src'").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("graft.team") == "data")
    // DESCRIBE lists the schema (+ partition section when partitioned)
    val desc = sql.sql(s"DESCRIBE TABLE graft.`$src`").collect()
    assert(desc.map(_.getString(0)).toSeq ==
      Seq("n_nationkey", "n_name", "n_regionkey"))
    // ... and DESCRIBE HISTORY/DETAIL still route to their own commands
    assert(sql.sql(s"DESCRIBE HISTORY '$src'").count() == 3)
  }

  test("ALTER COLUMN SET/DROP DEFAULT fills omitted writes through SQL") {
    val d = tempDir("sqlsurface-default")
    sql.sql(s"CREATE TABLE graft.`$d` (id BIGINT, tier STRING)")
    sql.sql(s"INSERT INTO graft.`$d` SELECT CAST(1 AS BIGINT), 'gold'")
    sql.sql(s"ALTER TABLE graft.`$d` ALTER COLUMN tier SET DEFAULT 'std'")
    // an omitted-column write now fills with the default
    DeltaTable.forPath(d).write(
      spark.range(2, 4).select(col("id").cast("long").as("id")),
      schemaMode = "merge")
    val t = DeltaTable.forPath(d).toDF(spark)
    assert(t.filter(col("tier") === "std").count() == 2)
    assert(t.filter(col("tier") === "gold").count() == 1)
    sql.sql(s"ALTER TABLE graft.`$d` ALTER COLUMN tier DROP DEFAULT")
    DeltaTable.forPath(d).write(
      spark.range(4, 5).select(col("id").cast("long").as("id")),
      schemaMode = "merge")
    val t2 = DeltaTable.forPath(d).toDF(spark)
    assert(t2.filter(col("id") === 4 && col("tier").isNull).count() == 1)
    // a non-constant default refuses loudly
    val ex = intercept[Exception](sql.sql(
      s"ALTER TABLE graft.`$d` ALTER COLUMN tier SET DEFAULT concat(id, 'x')"))
    assert(ex.getMessage.contains("constant"), ex.getMessage)
  }

  test("SHOW CREATE TABLE round-trips through the CREATE surface") {
    val d = tempDir("sqlsurface-showcreate")
    sql.sql(s"CREATE TABLE graft.`$d` (id BIGINT, name STRING " +
      "COMMENT 'label', amount DECIMAL(10,2)) PARTITIONED BY (name) " +
      "TBLPROPERTIES ('graft.kind' = 'ledger')")
    val stmt = sql.sql(s"SHOW CREATE TABLE graft.`$d`")
      .collect().head.getString(0)
    assert(stmt.contains("USING graft") && stmt.contains("PARTITIONED BY (name)")
      && stmt.contains("'graft.kind' = 'ledger'")
      && stmt.contains("COMMENT 'label'"), stmt)
    // the statement RECREATES an equivalent table when replayed at a new
    // path — the strongest fidelity check the verb can have
    val d2 = tempDir("sqlsurface-showcreate2")
    sql.sql(stmt.replace(s"graft.`$d`", s"graft.`$d2`"))
    val (t1, t2) = (DeltaTable.forPath(d), DeltaTable.forPath(d2))
    assert(t2.schema == t1.schema, t2.schema.treeString)
    assert(t2.dlog.partitionColumns == t1.dlog.partitionColumns)
    assert(t2.tableProperties("graft.kind") == "ledger")
  }

  test("OPTIMIZE is incremental on clustered tables; FULL forces re-cluster") {
    val d = tempDir("sqlsurface-liquid")
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    DeltaTable.forPath(d).write(nation.repartition(3))
      .clusterBy(Seq("n_nationkey", "n_regionkey"))
    sql.sql(s"OPTIMIZE '$d'") // clusters everything, tags outputs
    val v1 = DeltaTable.forPath(d).version
    // plain OPTIMIZE again: the cube tag-skips — commit-free no-op
    sql.sql(s"OPTIMIZE '$d'")
    assert(DeltaTable.forPath(d).version == v1,
      "repeat OPTIMIZE of a clustered table must no-op")
    // an append re-OPTIMIZEs only itself...
    DeltaTable.forPath(d).write(nation.repartition(2))
    val before = sql.sql(s"OPTIMIZE '$d'").collect().head
    assert(DeltaTable.forPath(d).toDF(spark).count() == 50)
    // ...and FULL rewrites the whole layout in one commit
    val r = sql.sql(s"OPTIMIZE '$d' FULL").collect().head
    assert(r.getLong(2) <= r.getLong(1), r.toString)
    assert(DeltaTable.forPath(d).toDF(spark).count() == 50)
  }

  test("REORG APPLY (PURGE) rewrites DV'd files; FSCK REPAIR drops ghosts") {
    // REORG: a MoR delete leaves a DV; purge must rewrite it away
    val d = tempDir("sqlsurface-reorg")
    DeltaTable.forPath(d)
      .write(spark.read.parquet(s"$sfDir/nation.parquet"))
      .deleteMergeOnRead(spark, Some(col("n_nationkey") < 5))
    assert(DeltaTable.forPath(d).dlog.addActions.values
      .exists(a => graft.sources.DeletionVectors.refOf(a).isDefined))
    sql.sql(s"REORG TABLE graft.`$d` APPLY (PURGE)")
    val t = DeltaTable.forPath(d)
    assert(t.dlog.addActions.values
      .forall(a => graft.sources.DeletionVectors.refOf(a).isEmpty))
    assert(t.toDF(spark).count() == 20)
    // FSCK: delete a data file out-of-band; DRY RUN reports, repair commits
    val d2 = tempDir("sqlsurface-fsck")
    DeltaTable.forPath(d2).write(
      spark.read.parquet(s"$sfDir/nation.parquet").repartition(4))
    val victim = DeltaTable.forPath(d2).dlog.addActions.keys.head
    java.nio.file.Files.delete(java.nio.file.Paths.get(d2, victim))
    val dry = sql.sql(s"FSCK REPAIR TABLE graft.`$d2` DRY RUN").collect()
    assert(dry.map(_.getString(0)).toSeq == Seq(victim))
    // dry run committed nothing: a real scan still fails on the ghost
    // (collect, not count — the metadata-only aggregate rule answers a
    // bare count from the log without opening any file, delta-spark's
    // own default)
    intercept[Exception](DeltaTable.forPath(d2).toDF(spark).collect())
    val fixed = sql.sql(s"FSCK REPAIR TABLE graft.`$d2`").collect()
    assert(fixed.map(_.getString(0)).toSeq == Seq(victim))
    val t2 = DeltaTable.forPath(d2)
    assert(t2.history.head._2.operation == "FSCK")
    assert(t2.toDF(spark).count() < 25 && t2.toDF(spark).count() > 0)
    // repaired table is clean: nothing left to repair
    assert(sql.sql(s"FSCK REPAIR TABLE graft.`$d2`").count() == 0)
  }

  test("GENERATE symlink_format_manifest writes the manifest") {
    val (d, _) = seeded()
    sql.sql(s"GENERATE symlink_format_manifest FOR TABLE '$d'")
    val manifest = new java.io.File(s"$d/_symlink_format_manifest/manifest")
    assert(manifest.exists())
  }

  test("ADD/DROP CONSTRAINT gates writes through SQL") {
    val (d, df) = seeded()
    val v0 = DeltaTable.forPath(d).version
    val r = sql.sql(
      s"ALTER TABLE '$d' ADD CONSTRAINT key_nonneg CHECK (n_nationkey >= 0)")
      .collect().head
    assert(r.getLong(0) == v0 + 1)
    assert(DeltaTable.forPath(d).constraints ==
      Map("key_nonneg" -> "n_nationkey >= 0"))
    // a violating batch is rejected BEFORE any file lands
    val bad = df.withColumn("n_nationkey", (-col("n_nationkey") - 1).cast("int"))
    intercept[Exception](DeltaTable.forPath(d).write(bad))
    // a constraint existing data violates refuses to attach
    intercept[Exception](sql.sql(
      s"ALTER TABLE '$d' ADD CONSTRAINT impossible CHECK (n_nationkey < 0)"))
    sql.sql(s"ALTER TABLE '$d' DROP CONSTRAINT key_nonneg")
    assert(DeltaTable.forPath(d).constraints.isEmpty)
    DeltaTable.forPath(d).write(bad)              // gate gone
  }

  test("CREATE TABLE with GENERATED/IDENTITY columns and CLUSTER BY") {
    val d = tempDir("sqlsurface-ddl")
    sql.sql(
      s"""CREATE TABLE graft.`$d` (
         |  rid BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100 INCREMENT BY 10),
         |  name STRING,
         |  uname STRING GENERATED ALWAYS AS (upper(name)),
         |  bal DOUBLE
         |) USING graft CLUSTER BY (name)""".stripMargin)
    val t0 = DeltaTable.forPath(d)
    assert(t0.schema.fieldNames.toSeq == Seq("rid", "name", "uname", "bal"))
    assert(t0.generatedColumns == Map("uname" -> "upper(name)"))
    assert(t0.identityColumns.keySet == Set("rid"))
    assert(t0.clusteringColumns == Seq("name"))
    // column-list INSERT omits rid + uname: identity allocates 100,110,…
    // in VALUES order, the generation expression computes uname
    sql.sql(s"INSERT INTO graft.`$d` (name, bal) VALUES " +
      "('ada', 1.0), ('bob', 2.0), ('eve', 3.0)")
    val rows = sql.sql(s"SELECT * FROM graft.`$d` ORDER BY rid").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(100L, 110L, 120L))
    assert(rows.map(_.getString(2)).toSeq == Seq("ADA", "BOB", "EVE"))
    // the high-water mark persists: a second insert continues the run
    sql.sql(s"INSERT INTO graft.`$d` (name, bal) VALUES ('zed', 4.0)")
    assert(sql.sql(s"SELECT max(rid) FROM graft.`$d`").head().getLong(0) == 130L)
    // explicit identity values reject (GENERATED ALWAYS)
    intercept[Exception](sql.sql(
      s"INSERT INTO graft.`$d` (rid, name, bal) VALUES (999, 'bad', 0.0)"))
    // ALTER ... CLUSTER BY re-declares; NONE un-clusters
    sql.sql(s"ALTER TABLE graft.`$d` CLUSTER BY (bal, name)")
    assert(DeltaTable.forPath(d).clusteringColumns == Seq("bal", "name"))
    sql.sql(s"ALTER TABLE graft.`$d` CLUSTER BY NONE")
    assert(DeltaTable.forPath(d).clusteringColumns.isEmpty)
  }

  test("CONVERT TO GRAFT adopts plain parquet in place") {
    val d = tempDir("sqlsurface-convert")
    spark.read.parquet(s"$sfDir/region.parquet")
      .write.mode("overwrite").parquet(d)
    val r = sql.sql(s"CONVERT TO GRAFT parquet.`$d`").collect().head
    assert(r.getAs[Long]("version") == 0L)
    assertSameRows(DeltaTable.forPath(d).toDF(spark),
      spark.read.parquet(s"$sfDir/region.parquet"))
  }

  // ---- catalog-named tables (X204) ----

  test("named tables: external CREATE registers; the full verb matrix " +
      "resolves by name; no strays") {
    val d = tempDir("sqlname-ext")
    val src = tempDir("sqlname-ext-src")
    DeltaTable.forPath(src).write(spark.read.parquet(s"$sfDir/nation.parquet"))
    sql.sql("DROP TABLE IF EXISTS nmx.nation_ext")
    sql.sql(s"CREATE TABLE nmx.nation_ext USING graft LOCATION '$d' " +
      s"AS SELECT * FROM graft.`$src` WHERE n_nationkey < 20")
    // registered, and the name resolves in every verb family
    assert(graft.sql.GraftCatalog.resolveName(sql, "nmx.nation_ext")
      .contains(d))
    assert(sql.sql("SELECT count(*) AS n FROM nmx.nation_ext")
      .head().getLong(0) == 20L)
    sql.sql(s"INSERT INTO nmx.nation_ext SELECT * FROM graft.`$src` " +
      "WHERE n_nationkey >= 20")
    sql.sql(
      s"""MERGE INTO nmx.nation_ext t USING graft.`$src` s
         |ON t.n_nationkey = s.n_nationkey
         |WHEN MATCHED AND s.n_nationkey < 3 THEN UPDATE SET n_regionkey = 9"""
        .stripMargin)
    sql.sql("UPDATE nmx.nation_ext SET n_name = upper(n_name) " +
      "WHERE n_nationkey = 5")
    sql.sql("DELETE FROM nmx.nation_ext WHERE n_nationkey = 24")
    sql.sql("OPTIMIZE nmx.nation_ext")
    val t = DeltaTable.forPath(d)
    assert(t.toDF(spark).count() == 24)
    assert(t.toDF(spark).filter(col("n_regionkey") === 9).count() == 3)
    // maintenance/metadata verbs by name
    assert(sql.sql("DESCRIBE HISTORY nmx.nation_ext").count() >= 5)
    assert(sql.sql("DESCRIBE DETAIL nmx.nation_ext").head()
      .getAs[String]("location").contains(d))
    // time travel by name: v0 is the CTAS slice
    assert(sql.sql("SELECT count(*) AS n FROM nmx.nation_ext VERSION AS OF 0")
      .head().getLong(0) == 20L)
    // SHOW GRAFT TABLES lists it
    assert(sql.sql("SHOW GRAFT TABLES").collect()
      .exists(r => r.getString(0) == "nmx.nation_ext" && r.getString(1) == d))
    // no strays: every on-disk data file is log-tracked (live or removed)
    val dlog = t.dlog
    val tracked = dlog.addActions.keySet ++
      dlog.entries.values.flatMap(_.removes).map(_.path)
    val onDisk = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(onDisk.subsetOf(tracked), s"untracked files: ${onDisk -- tracked}")
    // external DROP unregisters but keeps the data
    sql.sql("DROP TABLE nmx.nation_ext")
    assert(graft.sql.GraftCatalog.resolveName(sql, "nmx.nation_ext").isEmpty)
    assert(DeltaTable.forPath(d).version >= 0)
  }

  test("named tables: managed CTAS lands under the warehouse; DROP " +
      "deletes data; names are case-insensitive") {
    sql.sql("DROP TABLE IF EXISTS nmx.nation_mng")
    val src = tempDir("sqlname-mng-src")
    DeltaTable.forPath(src).write(spark.read.parquet(s"$sfDir/nation.parquet"))
    sql.sql(s"CREATE TABLE nmx.nation_mng USING graft AS " +
      s"SELECT * FROM graft.`$src`")
    val p = graft.sql.GraftCatalog.resolveName(sql, "nmx.nation_mng").get
    assert(p == graft.sql.GraftCatalog.defaultPath(sql, "nmx.nation_mng"), p)
    // case-insensitive resolution (Spark identifier semantics)
    assert(sql.sql("SELECT count(*) AS n FROM NMX.Nation_MNG")
      .head().getLong(0) == 25L)
    // IF NOT EXISTS over a live named table is a no-op that keeps state
    sql.sql(s"CREATE TABLE IF NOT EXISTS nmx.nation_mng USING graft AS " +
      s"SELECT * FROM graft.`$src` WHERE n_nationkey < 1")
    assert(sql.sql("SELECT count(*) AS n FROM nmx.nation_mng")
      .head().getLong(0) == 25L)
    // plain CREATE over a live name refuses
    val ex = intercept[Exception](sql.sql(
      "CREATE TABLE nmx.nation_mng (x INT) USING graft"))
    assert(ex.getMessage.contains("exists"), ex.getMessage)
    // managed DROP removes both the registration and the data dir
    sql.sql("DROP TABLE nmx.nation_mng")
    assert(graft.sql.GraftCatalog.resolveName(sql, "nmx.nation_mng").isEmpty)
    assert(!new java.io.File(p).exists())
  }

  test("named tables: temp views shadow names; unregistered names keep " +
      "Spark's errors; stale registrations are re-creatable") {
    val d = tempDir("sqlname-shadow")
    val src = tempDir("sqlname-shadow-src")
    DeltaTable.forPath(src).write(spark.read.parquet(s"$sfDir/region.parquet"))
    sql.sql("DROP TABLE IF EXISTS shadow_t")
    sql.sql(s"CREATE TABLE shadow_t USING graft LOCATION '$d' AS " +
      s"SELECT * FROM graft.`$src`")
    assert(sql.sql("SELECT count(*) AS n FROM shadow_t").head().getLong(0) == 5L)
    // a temp view with the same name WINS (Spark's own precedence) — for
    // reads AND for the command grammar (DESCRIBE falls to Spark's error)
    sql.range(3).createOrReplaceTempView("shadow_t")
    assert(sql.sql("SELECT count(*) AS n FROM shadow_t").head().getLong(0) == 3L)
    sql.catalog.dropTempView("shadow_t")
    assert(sql.sql("SELECT count(*) AS n FROM shadow_t").head().getLong(0) == 5L)
    // an unregistered name is NOT ours: Spark's not-found wording survives
    val ex = intercept[Exception](
      sql.sql("SELECT * FROM never_registered_xyz").collect())
    assert(!ex.getMessage.toLowerCase.contains("graft"), ex.getMessage)
    // a registration whose log is gone (wiped temp dir) does not block a
    // fresh CREATE under the same name
    graft.sql.GraftCatalog.register(sql, "stale_t", tempDir("sqlname-stale"))
    sql.sql(s"CREATE TABLE stale_t USING graft AS SELECT * FROM graft.`$src`")
    assert(sql.sql("SELECT count(*) AS n FROM stale_t").head().getLong(0) == 5L)
    sql.sql("DROP TABLE stale_t")
    sql.sql("DROP TABLE shadow_t")
  }

  test("table_changes TVF: versions, timestamps, names, and fallthrough") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val d = tempDir("tvf-cdf")
    var t = DeltaTable.forPath(d).write(
      (0 until 10).map(i => (i, s"v$i")).toDF("k", "v"),
      customMetadata = Map.empty)
    t = t.setTableProperties(Map("delta.enableChangeDataFeed" -> "true"))
    t = t.update(spark, Some(col("k") < 3), Map("v" -> lit("upd")))
    // start INCLUSIVE: version 2 alone carries the 3 pre + 3 post images
    val rows = sql.sql(s"SELECT _change_type, count(*) AS n " +
      s"FROM table_changes('$d', 2, 2) GROUP BY 1 ORDER BY 1").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("update_postimage", 3L), ("update_preimage", 3L)))
    // full range from 0 includes the create-commit inserts
    val all = sql.sql(s"SELECT count(*) AS n FROM table_changes('$d', 0)")
      .head().getLong(0)
    assert(all == 10L + 6L)
    // _commit_timestamp rides along (delta's third CDF column)
    assert(sql.sql(s"SELECT _commit_timestamp FROM table_changes('$d', 2, 2)")
      .collect().forall(!_.isNullAt(0)))
    // timestamp bounds: everything at-or-after v0's commit time
    val ts0 = new java.sql.Timestamp(t.history.last._2.effectiveTimestamp)
    val byTs = sql.sql(s"SELECT count(*) AS n FROM table_changes('$d', '$ts0')")
      .head().getLong(0)
    assert(byTs == 16L, s"timestamp start at v0 must cover the whole feed, got $byTs")
    // a registered NAME resolves through the same TVF
    sql.sql("DROP TABLE IF EXISTS tvf_cdf_named")
    sql.sql(s"CREATE TABLE IF NOT EXISTS tvf_cdf_named USING graft LOCATION '$d'")
    assert(sql.sql("SELECT count(*) AS n FROM table_changes('tvf_cdf_named', 2, 2)")
      .head().getLong(0) == 6L)
    sql.sql("DROP TABLE tvf_cdf_named")
    // a non-graft address stays unresolved: Spark's own wording survives
    val ex = intercept[Exception](
      sql.sql("SELECT * FROM table_changes('not_a_table_xyz', 0)").collect())
    assert(!ex.getMessage.toLowerCase.contains("graft"), ex.getMessage)
  }

  test("INSERT INTO … REPLACE WHERE: scoped swap in one commit; " +
      "out-of-scope rows refuse; names resolve") {
    import org.apache.spark.sql.functions._
    val d = tempDir("sqlsurface-rw")
    DeltaTable.forPath(d).write(
      spark.read.parquet(s"$sfDir/nation.parquet"),
      partitionBy = Some(Seq("n_regionkey")))
    sql.sql(s"INSERT INTO graft.`$d` REPLACE WHERE n_regionkey = 2 " +
      "SELECT n_nationkey + 100 AS n_nationkey, n_name, 2 AS n_regionkey " +
      s"FROM graft.`$d` WHERE n_regionkey = 2")
    val t = DeltaTable.forPath(d)
    assert(t.version == 1L, "REPLACE WHERE must be ONE commit")
    val keys = t.toDF(spark).filter(col("n_regionkey") === 2)
      .select("n_nationkey").collect()
      .map(_.get(0).asInstanceOf[Number].longValue).sorted
    assert(keys.forall(_ >= 100), keys.mkString(","))
    assert(t.toDF(spark).filter(col("n_regionkey") =!= 2).count() == 20)
    // scoping contract: a row OUTSIDE the predicate refuses the commit
    val ex = intercept[Exception](
      sql.sql(s"INSERT INTO graft.`$d` REPLACE WHERE n_regionkey = 2 " +
        "SELECT 999 AS n_nationkey, 'x' AS n_name, 3 AS n_regionkey"))
    assert(ex.getMessage.toLowerCase.contains("predicate")
      || ex.getMessage.toLowerCase.contains("replacewhere")
      || ex.getMessage.toLowerCase.contains("satisf"), ex.getMessage)
    assert(DeltaTable.forPath(d).version == 1L, "failed swap must not commit")
    // registered names take the verb too
    sql.sql("DROP TABLE IF EXISTS rw_named")
    sql.sql(s"CREATE TABLE IF NOT EXISTS rw_named USING graft LOCATION '$d'")
    sql.sql("INSERT INTO rw_named REPLACE WHERE n_regionkey = 2 " +
      "SELECT n_nationkey + 100 AS n_nationkey, n_name, 2 AS n_regionkey " +
      "FROM rw_named WHERE n_regionkey = 2")
    assert(DeltaTable.forPath(d).toDF(spark)
      .filter(col("n_regionkey") === 2)
      .select(min(col("n_nationkey"))).head()
      .get(0).asInstanceOf[Number].longValue >= 200)
    sql.sql("DROP TABLE rw_named")
  }

  test("COPY INTO: CSV options, PATTERN, force reload, name addressing") {
    val landing = tempDir("copyinto-csv")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(landing, "a.csv"), "k,v\n1,aa\n2,bb\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(landing, "b.csv"), "k,v\n3,cc\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(landing, "notes.txt"), "ignore me")
    val d = tempDir("copyinto-table")
    val r1 = sql.sql(s"COPY INTO '$d' FROM '$landing' FILEFORMAT = CSV " +
      "PATTERN = '*.csv' " +
      "FORMAT_OPTIONS('header' = 'true', 'inferSchema' = 'true')").head()
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) == ((2L, 0L, 3L)), r1.toString)
    assert(DeltaTable.forPath(d).toDF(spark).count() == 3L)
    // idempotent re-run
    val r2 = sql.sql(s"COPY INTO '$d' FROM '$landing' FILEFORMAT = CSV " +
      "PATTERN = '*.csv' FORMAT_OPTIONS('header' = 'true', 'inferSchema' = 'true')").head()
    assert(r2.getLong(0) == 0L && r2.getLong(1) == 2L, r2.toString)
    // force reloads everything (rows double)
    val r3 = sql.sql(s"COPY INTO '$d' FROM '$landing' FILEFORMAT = CSV " +
      "PATTERN = '*.csv' FORMAT_OPTIONS('header' = 'true', 'inferSchema' = 'true') " +
      "COPY_OPTIONS('force' = 'true')").head()
    assert(r3.getLong(0) == 2L, r3.toString)
    assert(DeltaTable.forPath(d).toDF(spark).count() == 6L)
    // registered names take the verb too
    sql.sql("DROP TABLE IF EXISTS copy_named")
    sql.sql(s"CREATE TABLE IF NOT EXISTS copy_named USING graft LOCATION '$d'")
    val r4 = sql.sql(s"COPY INTO copy_named FROM '$landing' FILEFORMAT = CSV " +
      "PATTERN = '*.csv' FORMAT_OPTIONS('header' = 'true', 'inferSchema' = 'true')").head()
    assert(r4.getLong(0) == 0L, r4.toString)
    sql.sql("DROP TABLE copy_named")
  }

  test("named tables: SHALLOW CLONE to a fresh NAME registers the clone") {
    val src = tempDir("sqlname-clone-src")
    DeltaTable.forPath(src).write(spark.read.parquet(s"$sfDir/region.parquet"))
    sql.sql("DROP TABLE IF EXISTS nmx.region_clone")
    sql.sql(s"CREATE TABLE nmx.region_clone SHALLOW CLONE graft.`$src`")
    val p = graft.sql.GraftCatalog.resolveName(sql, "nmx.region_clone").get
    assert(sql.sql("SELECT count(*) AS n FROM nmx.region_clone")
      .head().getLong(0) == 5L)
    sql.sql("DROP TABLE nmx.region_clone") // managed-path clone: data goes
    assert(!new java.io.File(p).exists())
  }
}
