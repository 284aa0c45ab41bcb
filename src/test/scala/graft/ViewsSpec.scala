package graft

import org.apache.spark.sql.functions._

/** SQL views through GraftCatalog's DSv2 ViewCatalog: CREATE / CREATE OR
  * REPLACE / SHOW / ALTER ... TBLPROPERTIES / RENAME-ish (catalog API) /
  * DROP, with the view SQL persisted in versioned Iceberg-view-spec-
  * shaped metadata and re-resolved at read time (a view over a mutated
  * table must serve the CURRENT rows).
  */
class ViewsSpec extends SparkSpec {

  private def freshCat(name: String): String = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft-views-$name")
      .toString
    spark.conf.set(s"spark.sql.catalog.$name", "graft.connector.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    wh
  }

  test("create, read, replace, drop a SQL view end-to-end") {
    freshCat("gv")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gv.db")
    spark.sql("CREATE TABLE gv.db.t (id BIGINT, v DOUBLE, tag STRING)")
    spark.sql("INSERT INTO gv.db.t VALUES (1, 1.5, 'a'), (2, 2.5, 'b'), " +
      "(3, 3.5, 'a'), (4, 4.5, 'b')")

    spark.sql("CREATE VIEW gv.db.v_a AS " +
      "SELECT id, v FROM gv.db.t WHERE tag = 'a'")
    val got = spark.sql("SELECT * FROM gv.db.v_a ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 1.5), (3L, 3.5)))

    // the view re-resolves against CURRENT table state
    spark.sql("INSERT INTO gv.db.t VALUES (5, 5.5, 'a')")
    assert(spark.sql("SELECT count(*) AS n FROM gv.db.v_a").head.getLong(0)
      == 3L)

    // SHOW VIEWS lists it; tables are not views and vice versa
    val shown = spark.sql("SHOW VIEWS IN gv.db").collect()
      .map(_.getString(1)).toSet
    assert(shown == Set("v_a"))
    assert(spark.sql("SHOW TABLES IN gv.db").collect()
      .map(_.getString(1)).toSet == Set("t"))

    // CREATE OR REPLACE swaps the definition (new version, same name)
    spark.sql("CREATE OR REPLACE VIEW gv.db.v_a AS " +
      "SELECT id, v FROM gv.db.t WHERE tag = 'b'")
    val got2 = spark.sql("SELECT id FROM gv.db.v_a ORDER BY id").collect()
      .map(_.getLong(0)).toSeq
    assert(got2 == Seq(2L, 4L))

    // duplicate CREATE without OR REPLACE fails; IF NOT EXISTS no-ops
    intercept[Exception](spark.sql(
      "CREATE VIEW gv.db.v_a AS SELECT 1 AS one"))
    spark.sql("CREATE VIEW IF NOT EXISTS gv.db.v_a AS SELECT 1 AS one")
    assert(spark.sql("SELECT id FROM gv.db.v_a ORDER BY id").count() == 2)

    // ALTER VIEW properties round-trip through the versioned metadata
    spark.sql("ALTER VIEW gv.db.v_a SET TBLPROPERTIES ('owner_team'='ml')")
    val cat = spark.sessionState.catalogManager.catalog("gv")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.ViewCatalog]
    def propsOf: Map[String, String] = {
      import scala.jdk.CollectionConverters._
      cat.loadView(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("db"), "v_a")).properties().asScala.toMap
    }
    assert(propsOf.get("owner_team").contains("ml"))
    spark.sql("ALTER VIEW gv.db.v_a UNSET TBLPROPERTIES ('owner_team')")
    assert(!propsOf.contains("owner_team"))

    spark.sql("DROP VIEW gv.db.v_a")
    assert(spark.sql("SHOW VIEWS IN gv.db").isEmpty)
    intercept[Exception](spark.sql("SELECT * FROM gv.db.v_a"))
  }

  test("view metadata is versioned and replayable (Iceberg view shape)") {
    val wh = freshCat("gvm")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gvm.db")
    spark.sql("CREATE TABLE gvm.db.s (id BIGINT)")
    spark.sql("INSERT INTO gvm.db.s VALUES (1), (2)")
    spark.sql("CREATE VIEW gvm.db.w AS SELECT id FROM gvm.db.s")
    spark.sql("CREATE OR REPLACE VIEW gvm.db.w AS " +
      "SELECT id * 2 AS id2 FROM gvm.db.s")

    val dir = java.nio.file.Paths.get(wh, "db", "w", "viewmeta")
    val files = java.nio.file.Files.list(dir)
    val names =
      try {
        import scala.jdk.CollectionConverters._
        files.iterator().asScala.map(_.getFileName.toString).toList.sorted
      } finally files.close()
    assert(names == List("v00001.view-metadata.json",
      "v00002.view-metadata.json"))

    val st = graft.connector.GraftViews.fromJson(
      java.nio.file.Files.readString(dir.resolve(names.last)))
    assert(st.versions.map(_.versionId) == Seq(1, 2))
    assert(st.currentVersionId == 2)
    assert(st.versions.head.sql.contains("SELECT id FROM"))
    assert(st.current.sql.contains("id * 2"))
    // the default catalog is the SESSION's current catalog at creation
    // (the body here is fully qualified, so resolution never needs it)
    assert(st.versions.forall(_.currentCatalog == "spark_catalog"))
    // round-trip: serialize the parsed state back and reparse identically
    val rt = graft.connector.GraftViews.fromJson(
      graft.connector.GraftViews.toJson(st))
    assert(rt == st)
  }

  test("nested views, CTE bodies, and cycle detection") {
    freshCat("gvn")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gvn.db")
    spark.sql("CREATE TABLE gvn.db.t (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gvn.db.t VALUES (1, 10.0), (2, 20.0), " +
      "(3, 30.0), (4, 40.0)")
    // a CTE inside the stored body must survive substitution
    spark.sql("""CREATE VIEW gvn.db.v1 AS
      WITH big AS (SELECT id, v FROM gvn.db.t WHERE v >= 20.0)
      SELECT id, v * 2 AS v2 FROM big""")
    // ... and a view over that view expands recursively in one pass
    spark.sql("CREATE VIEW gvn.db.v2 AS " +
      "SELECT SUM(v2) AS total, COUNT(*) AS n FROM gvn.db.v1")
    val r = spark.sql("SELECT total, n FROM gvn.db.v2").head
    assert(r.getDouble(0) == 180.0 && r.getLong(1) == 3L)

    // a materialized view OVER a plain view: creation expands the view,
    // materializes its rows, and stays stale when the base moves
    spark.sql("CREATE MATERIALIZED VIEW gvn.db.m1 AS " +
      "SELECT total FROM gvn.db.v2")
    spark.sql("INSERT INTO gvn.db.t VALUES (5, 50.0)")
    assert(spark.sql("SELECT total FROM gvn.db.m1").head.getDouble(0)
      == 180.0)
    spark.sql("CALL gvn.system.refresh_mview('db.m1')")
    assert(spark.sql("SELECT total FROM gvn.db.m1").head.getDouble(0)
      == 280.0)

    // a definition cycle is a clear RECURSIVE_VIEW error, not an
    // analyzer max-iterations blowup: v_a -> v_b, then v_a REPLACED to
    // read v_b
    spark.sql("CREATE VIEW gvn.db.va AS SELECT id FROM gvn.db.t")
    spark.sql("CREATE VIEW gvn.db.vb AS SELECT id FROM gvn.db.va")
    spark.sql("CREATE OR REPLACE VIEW gvn.db.va AS " +
      "SELECT id FROM gvn.db.vb")
    val e = intercept[Exception](spark.sql("SELECT * FROM gvn.db.va")
      .collect())
    assert(e.getMessage.contains("RECURSIVE_VIEW") ||
      e.getMessage.toLowerCase.contains("recursive"), e.getMessage)
  }

  test("materialized view: stale until refreshed, refresh is atomic") {
    freshCat("gmv")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmv.db")
    spark.sql("CREATE TABLE gmv.db.base (id BIGINT, grp STRING)")
    spark.sql("INSERT INTO gmv.db.base VALUES (1,'a'), (2,'b'), (3,'a')")
    spark.sql("CREATE MATERIALIZED VIEW gmv.db.counts AS " +
      "SELECT grp, COUNT(*) AS n FROM gmv.db.base GROUP BY grp")
    def read: Map[String, Long] = spark.sql(
      "SELECT grp, n FROM gmv.db.counts").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(read == Map("a" -> 2L, "b" -> 1L))

    // a base mutation must NOT show through — the TABLE serves, the SQL
    // is not silently re-expanded
    spark.sql("INSERT INTO gmv.db.base VALUES (4,'b'), (5,'b')")
    assert(read == Map("a" -> 2L, "b" -> 1L),
      "materialized view re-computed on read — not materialized")
    // ... and the read plan must be a plain table scan, no join/agg
    val plan = spark.sql("SELECT * FROM gmv.db.counts")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Aggregate"),
      s"materialized read still aggregates:\n$plan")

    // refresh recomputes the stored SQL and swaps atomically
    val out = spark.sql(
      "CALL gmv.system.refresh_mview('db.counts')").collect()
    assert(out.head.getLong(1) == 2L, "refresh must report row count")
    assert(read == Map("a" -> 2L, "b" -> 3L))

    // listed as a view AND queryable as a table; IF NOT EXISTS no-ops
    assert(spark.sql("SHOW VIEWS IN gmv.db").collect()
      .map(_.getString(1)).toSet == Set("counts"))
    spark.sql("CREATE MATERIALIZED VIEW IF NOT EXISTS gmv.db.counts AS " +
      "SELECT 1 AS one")
    assert(read == Map("a" -> 2L, "b" -> 3L))
    intercept[Exception](spark.sql(
      "CREATE MATERIALIZED VIEW gmv.db.counts AS SELECT 1 AS one"))
    // refresh on a PLAIN view is refused
    spark.sql("CREATE VIEW gmv.db.plain AS SELECT id FROM gmv.db.base")
    intercept[Exception](spark.sql(
      "CALL gmv.system.refresh_mview('db.plain')"))
    // a materialized view cannot be silently demoted or moved: REPLACE
    // as a plain view would leave the table serving stale rows with no
    // refresh path, and a rename would orphan the pinned absolute paths
    intercept[Exception](spark.sql(
      "CREATE OR REPLACE VIEW gmv.db.counts AS SELECT 1 AS one"))
    intercept[Exception](spark.sql(
      "ALTER VIEW gmv.db.counts RENAME TO gmv.db.counts2"))
    assert(read == Map("a" -> 2L, "b" -> 3L))
    // DROP TABLE tears the whole thing down (it IS a table on disk)
    spark.sql("DROP TABLE gmv.db.counts")
    assert(spark.sql("SHOW VIEWS IN gmv.db").collect()
      .map(_.getString(1)).toSet == Set("plain"))
  }

  test("resolution under USE and SHOW VIEWS LIKE literals") {
    freshCat("gvu")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gvu.db")
    spark.sql("CREATE TABLE gvu.db.t (id BIGINT)")
    spark.sql("INSERT INTO gvu.db.t VALUES (9)")
    spark.sql("CREATE VIEW gvu.db.v AS SELECT id FROM gvu.db.t")
    val cm = spark.sessionState.catalogManager
    val (prevCat, prevNs) = (cm.currentCatalog.name(), cm.currentNamespace)
    try {
      spark.sql("USE gvu.db")
      // bare name takes the current namespace; a multi-part name is
      // already namespace-qualified within the current catalog (db.v
      // must NOT resolve as db.db.v)
      assert(spark.sql("SELECT id FROM v").head.getLong(0) == 9L)
      assert(spark.sql("SELECT id FROM db.v").head.getLong(0) == 9L)
      spark.sql("DROP VIEW db.v")
      assert(spark.sql("SHOW VIEWS IN gvu.db").isEmpty)
      spark.sql("CREATE VIEW db.v AS SELECT id FROM gvu.db.t")
    } finally {
      cm.setCurrentCatalog(prevCat)
      cm.setCurrentNamespace(prevNs)
    }
    // SHOW VIEWS LIKE: '*' wildcard and '|' alternatives; everything
    // else literal — regex metacharacters in a pattern must not throw
    spark.sql("CREATE VIEW gvu.db.other AS SELECT 1 AS one")
    def shown(like: String): Set[String] =
      spark.sql(s"SHOW VIEWS IN gvu.db LIKE '$like'").collect()
        .map(_.getString(1)).toSet
    assert(shown("v") == Set("v"))
    assert(shown("v|other") == Set("v", "other"))
    assert(shown("oth*") == Set("other"))
    assert(shown("v(1)") == Set.empty)
  }

  test("ALTER VIEW AS, SHOW CREATE, DESCRIBE EXTENDED round out the " +
      "DDL surface") {
    freshCat("gvd")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gvd.db")
    spark.sql("CREATE TABLE gvd.db.t (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gvd.db.t VALUES (1, 1.5), (2, 2.5), (3, 3.5)")
    spark.sql("CREATE VIEW gvd.db.v AS SELECT id FROM gvd.db.t")
    spark.sql("ALTER VIEW gvd.db.v SET TBLPROPERTIES ('team'='ml')")

    // ALTER VIEW ... AS commits a NEW version; the old SQL stays in the
    // version log and the new definition serves immediately
    spark.sql("ALTER VIEW gvd.db.v AS " +
      "SELECT id, v * 2 AS v2 FROM gvd.db.t WHERE id > 1")
    val got = spark.sql("SELECT id, v2 FROM gvd.db.v ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((2L, 5.0), (3L, 7.0)))
    val st = graft.connector.GraftViews.load(
      java.nio.file.Paths.get(
        spark.conf.get("spark.sql.catalog.gvd.warehouse"), "db", "v")).get
    assert(st.versions.map(_.versionId) == Seq(1, 2, 3))
    assert(st.versions.head.sql.contains("SELECT id FROM"))
    assert(st.current.sql.contains("v * 2"))
    // properties survive the definition change
    assert(st.current.properties.get("team").contains("ml"))

    // SHOW CREATE TABLE renders reproducing DDL incl. properties
    val ddl = spark.sql("SHOW CREATE TABLE gvd.db.v").head.getString(0)
    assert(ddl.contains("CREATE VIEW gvd.db.v"), ddl)
    assert(ddl.contains("'team' = 'ml'"), ddl)
    assert(ddl.contains("AS SELECT id, v * 2 AS v2"), ddl)

    // DESCRIBE: columns; EXTENDED adds defaults + version history
    val plain = spark.sql("DESCRIBE gvd.db.v").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(plain == Seq(("id", "bigint"), ("v2", "double")))
    val ext = spark.sql("DESCRIBE EXTENDED gvd.db.v").collect()
      .map(_.getString(0)).toSeq
    assert(ext.contains("# Detailed View Information"), ext)
    assert(ext.contains("# Version History"), ext)
    assert(ext.count(_.startsWith("v")) >= 3) // v1..v3 listed
    val hist = spark.sql("DESCRIBE EXTENDED gvd.db.v").collect()
      .filter(_.getString(0) == "v3")
    assert(hist.length == 1 && hist.head.getString(2) == "(current)")

    // ALTER VIEW AS on a MATERIALIZED view is refused with a clear error
    spark.sql("CREATE MATERIALIZED VIEW gvd.db.m AS " +
      "SELECT COUNT(*) AS n FROM gvd.db.t")
    val e = intercept[Exception](spark.sql(
      "ALTER VIEW gvd.db.m AS SELECT 1 AS one"))
    assert(e.getMessage.contains("MATERIALIZED"), e.getMessage)
    // ... and SHOW CREATE on it renders the materialized kind
    assert(spark.sql("SHOW CREATE TABLE gvd.db.m").head.getString(0)
      .contains("CREATE MATERIALIZED VIEW"))
  }

  test("temp views keep precedence over graft view DDL and reads") {
    freshCat("gvt")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gvt.db")
    spark.sql("CREATE TABLE gvt.db.t (id BIGINT)")
    spark.sql("INSERT INTO gvt.db.t VALUES (1)")
    spark.sql("CREATE VIEW gvt.db.sameview AS SELECT id FROM gvt.db.t")
    val cm = spark.sessionState.catalogManager
    val (prevCat, prevNs) = (cm.currentCatalog.name(), cm.currentNamespace)
    try {
      spark.sql("USE gvt.db")
      spark.sql("CREATE TEMPORARY VIEW sameview AS SELECT 42 AS marker")
      // reads: the temp view wins over the same-named catalog view
      assert(spark.sql("SELECT * FROM sameview").head.getInt(0) == 42)
      // DDL: DROP VIEW with the bare name must drop the TEMP view
      // (Spark's handling), leaving the catalog view alive
      spark.sql("DROP VIEW sameview")
      assert(!spark.catalog.tableExists("sameview") ||
        spark.sql("SELECT id FROM sameview").head.getLong(0) == 1L)
      assert(spark.sql("SHOW VIEWS IN gvt.db").collect()
        .map(_.getString(1)).toSet == Set("sameview"),
        "catalog view must survive a temp-view DROP")
      // and now the catalog view serves again under the bare name
      assert(spark.sql("SELECT id FROM sameview").head.getLong(0) == 1L)
      spark.sql("DROP VIEW sameview")
      assert(spark.sql("SHOW VIEWS IN gvt.db").isEmpty)
    } finally {
      cm.setCurrentCatalog(prevCat)
      cm.setCurrentNamespace(prevNs)
    }
  }

  test("stored-body subqueries qualify against the view's defaults") {
    freshCat("gvs")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gvs.db")
    spark.sql("CREATE TABLE gvs.db.f (id BIGINT, k BIGINT)")
    spark.sql("CREATE TABLE gvs.db.d (k BIGINT)")
    spark.sql("INSERT INTO gvs.db.f VALUES (1, 10), (2, 20), (3, 30)")
    spark.sql("INSERT INTO gvs.db.d VALUES (10), (30)")
    val cm = spark.sessionState.catalogManager
    val (prevCat, prevNs) = (cm.currentCatalog.name(), cm.currentNamespace)
    try {
      spark.sql("USE gvs.db")
      // body references `d` UNQUALIFIED inside an IN-subquery and a
      // scalar subquery — both must bind to gvs.db at READ time even
      // when the reader's USE context has moved elsewhere
      spark.sql("""CREATE VIEW vsub AS
        SELECT id FROM f
        WHERE k IN (SELECT k FROM d)
          AND id <= (SELECT MAX(k) FROM d)""")
    } finally {
      cm.setCurrentCatalog(prevCat)
      cm.setCurrentNamespace(prevNs)
    }
    // read from a DIFFERENT catalog context: unqualified subquery tables
    // must not resolve against spark_catalog (where `d` doesn't exist)
    val got = spark.sql("SELECT id FROM gvs.db.vsub ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 3L))
  }

  test("half-created materialized view degrades to plain-view reads") {
    val wh = freshCat("gvh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gvh.db")
    spark.sql("CREATE TABLE gvh.db.b (id BIGINT)")
    spark.sql("INSERT INTO gvh.db.b VALUES (1), (2), (3)")
    // the committed creation is two-phase: v1 plain, v2 materialized
    spark.sql("CREATE MATERIALIZED VIEW gvh.db.m AS " +
      "SELECT COUNT(*) AS n FROM gvh.db.b")
    val metaDir = java.nio.file.Paths.get(wh, "db", "m", "viewmeta")
    val ls = java.nio.file.Files.list(metaDir)
    val names =
      try { import scala.jdk.CollectionConverters._
        ls.iterator().asScala.map(_.getFileName.toString).toList.sorted }
      finally ls.close()
    assert(names.size == 2, s"expected 2 phased version files: $names")
    val v1 = graft.connector.GraftViews.fromJson(
      java.nio.file.Files.readString(metaDir.resolve(names.head)))
    assert(!v1.current.properties.contains(
      graft.connector.GraftViews.MaterializedProp),
      "phase-1 version must be a plain view")

    // simulate the crash window: a view whose table dir exists (even
    // with rows missing) but whose materialized tag never committed must
    // be served by SQL expansion, not by the half-built table
    spark.sql("CREATE VIEW gvh.db.crashed AS " +
      "SELECT COUNT(*) AS n FROM gvh.db.b")
    graft.table.GraftTable.create(spark,
      java.nio.file.Paths.get(wh, "db", "crashed").toString,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType))), Seq.empty)
    assert(spark.sql("SELECT n FROM gvh.db.crashed").head.getLong(0) == 3L,
      "half-created MV served the empty table instead of expanding SQL")
  }

  test("a view name never collides with a table; rename moves metadata") {
    freshCat("gvc")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gvc.db")
    spark.sql("CREATE TABLE gvc.db.t (id BIGINT)")
    // a view may not shadow an existing table
    intercept[Exception](spark.sql(
      "CREATE VIEW gvc.db.t AS SELECT 1 AS one"))
    spark.sql("CREATE VIEW gvc.db.v AS SELECT id FROM gvc.db.t")
    // ... and a table may not shadow an existing view (dir exists but is
    // not a table dir — create must fail, not silently nest)
    intercept[Exception](spark.sql("CREATE TABLE gvc.db.v (x INT)"))

    spark.sql("ALTER VIEW gvc.db.v RENAME TO gvc.db.v2")
    assert(spark.sql("SHOW VIEWS IN gvc.db").collect()
      .map(_.getString(1)).toSet == Set("v2"))
    spark.sql("INSERT INTO gvc.db.t VALUES (7)")
    assert(spark.sql("SELECT id FROM gvc.db.v2").head.getLong(0) == 7L)
  }
}
