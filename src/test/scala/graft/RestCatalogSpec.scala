package graft

import graft.connector.rest.{GraftRestClient, GraftRestServer, RestMetadataIo, RestProtocol}
import graft.table.{CommitConflictException, GraftTable}
import org.apache.spark.sql.functions._

/** In-process Iceberg REST catalog: DDL + INSERT + pruned SELECT through
  * the REST-backed catalog must equal direct-catalog results; commits
  * flow through the requirements-guarded protocol (NOT around it), the
  * optimistic-commit conflict path retries correctly, and requirement
  * violations surface as 409 → CommitConflictException.
  */
class RestCatalogSpec extends SparkSpec {

  private def startServer(): (GraftRestServer, String) = {
    val wh = java.nio.file.Files
      .createTempDirectory("graft-rest").toString
    val srv = new GraftRestServer(wh)
    srv.start()
    (srv, wh)
  }

  test("DDL + INSERT + pruned SELECT through REST == direct catalog") {
    val (srv, wh) = startServer()
    try {
      spark.conf.set("spark.sql.catalog.grc", "graft.connector.GraftCatalog")
      spark.conf.set("spark.sql.catalog.grc.uri", srv.uri)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS grc.db")
      spark.sql("""CREATE TABLE grc.db.ev (id BIGINT, ts TIMESTAMP_NTZ,
        v DOUBLE) PARTITIONED BY (days(ts))""")
      spark.range(300).selectExpr("id",
        "timestamp_ntz'2026-03-01 00:00:00' + make_interval(0,0,0,0,CAST(id % 72 AS INT)) AS ts",
        "CAST(id AS DOUBLE) AS v")
        .createOrReplaceTempView("ev_src")
      spark.sql("INSERT INTO grc.db.ev SELECT * FROM ev_src")

      // lifecycle went through the service: the table is visible to a
      // plain REST client and its commits appear in the metadata
      val client = new GraftRestClient(srv.uri)
      assert(client.listNamespaces() == Seq(Seq("db")))
      assert(client.listTables(Seq("db")) == Seq("ev"))
      val (_, meta) = client.loadTable(Seq("db"), "ev").get
      assert(meta.snapshots.exists(_.nonEmpty), "append did not commit")
      assert(meta.currentSnapshotId.isDefined)

      // pruned read parity with the same data written directly
      val got = spark.sql("""SELECT COUNT(*) AS n, SUM(v) AS s
        FROM grc.db.ev WHERE ts >= TIMESTAMP_NTZ'2026-03-02 00:00:00'""")
        .head
      val exp = spark.sql("""SELECT COUNT(*) AS n, SUM(v) AS s
        FROM ev_src WHERE ts >= TIMESTAMP_NTZ'2026-03-02 00:00:00'""").head
      assert(got == exp, s"$got != $exp")

      // schema evolution + UPDATE commit through the protocol too
      spark.sql("ALTER TABLE grc.db.ev ADD COLUMN tag STRING")
      spark.sql("UPDATE grc.db.ev SET tag = 'hot' WHERE id < 10")
      assert(spark.sql(
        "SELECT COUNT(*) FROM grc.db.ev WHERE tag = 'hot'")
        .head.getLong(0) == 10L)
      val (_, meta2) = client.loadTable(Seq("db"), "ev").get
      assert(meta2.schemas.size == 2 && meta2.currentSchemaId == 1,
        "ADD COLUMN did not reach the service")

      // DROP via REST
      spark.sql("DROP TABLE grc.db.ev")
      assert(!client.tableExists(Seq("db"), "ev"))
    } finally srv.stop()
  }

  test("optimistic-commit conflict: stale base retries and converges") {
    val (srv, wh) = startServer()
    try {
      val client = new GraftRestClient(srv.uri)
      client.createNamespace(Seq("db"))
      spark.conf.set("spark.sql.catalog.grk", "graft.connector.GraftCatalog")
      spark.conf.set("spark.sql.catalog.grk.uri", srv.uri)
      spark.sql("CREATE TABLE grk.db.t (id BIGINT, v DOUBLE)")

      // two handles over the SAME REST table; both append — the loser's
      // requirements fail (main moved / sequence claimed), it re-derives
      // through retryingCommit and lands on top
      val io1 = new RestMetadataIo(client, Seq("db"), "t")
      val io2 = new RestMetadataIo(client, Seq("db"), "t")
      val loc = java.nio.file.Paths.get(wh, "db", "t").toString
      val t1 = GraftTable.load(spark, loc, io1)
      val t2 = GraftTable.load(spark, loc, io2)
      import spark.implicits._
      val threads = (1 to 4).map { i =>
        new Thread(() => {
          val t = if (i % 2 == 0) t1 else t2
          t.append(Seq.tabulate(10)(j =>
            (i * 100L + j, j.toDouble)).toDF("id", "v"))
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(spark.sql("SELECT COUNT(*) FROM grk.db.t").head.getLong(0)
        == 40L, "a concurrent append was lost")
      val (_, meta) = client.loadTable(Seq("db"), "t").get
      assert(meta.snapshots.get.size == 4)
      // sequence numbers are dense and unique: the server's global
      // sequence check forced every retry to re-derive
      assert(meta.snapshots.get.map(_.sequenceNumber).sorted ==
        Seq(1L, 2L, 3L, 4L))

      // a HAND-BUILT stale commit (no retry loop) must 409
      val stale = meta.copy(currentSnapshotId = None)
      val snap = meta.snapshots.get.head
      val bogus = graft.model.Json.obj
      bogus.put("type", "assert-ref-snapshot-id")
      bogus.put("ref", "main")
      bogus.put("snapshot-id", snap.snapshotId) // main is PAST this
      intercept[CommitConflictException] {
        client.commitTable(Seq("db"), "t", Seq(bogus), Seq.empty)
      }
      // ... and a wrong-uuid assertion too
      val wrongUuid = graft.model.Json.obj
      wrongUuid.put("type", "assert-table-uuid")
      wrongUuid.put("uuid", "00000000-0000-0000-0000-000000000000")
      intercept[CommitConflictException] {
        client.commitTable(Seq("db"), "t", Seq(wrongUuid), Seq.empty)
      }
    } finally srv.stop()
  }

  test("write-audit-publish through REST: branch commit + fast-forward") {
    val (srv, wh) = startServer()
    try {
      spark.conf.set("spark.sql.catalog.grw", "graft.connector.GraftCatalog")
      spark.conf.set("spark.sql.catalog.grw.uri", srv.uri)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS grw.db")
      spark.sql("CREATE TABLE grw.db.t (id BIGINT)")
      spark.sql("INSERT INTO grw.db.t SELECT id FROM range(10)")
      // stage to a branch: the commit carries set-snapshot-ref for the
      // BRANCH — main must not move, and the branch ref must be visible
      // through a plain REST client
      val client = new GraftRestClient(srv.uri)
      val head0 = client.loadTable(Seq("db"), "t").get
        ._2.currentSnapshotId.get
      spark.sql(s"CALL grw.system.create_branch('db.t', 'wip', $head0)")
      spark.range(10, 20).selectExpr("id")
        .writeTo("grw.db.t").option("branch", "wip").append()
      val (_, m1) = client.loadTable(Seq("db"), "t").get
      val refs1 = m1.refs.get
      assert(refs1.contains("wip"), "branch ref missing from service")
      assert(m1.currentSnapshotId.contains(refs1("main").snapshotId))
      assert(refs1("main").snapshotId != refs1("wip").snapshotId)
      // unpublished rows invisible on main
      assert(spark.sql("SELECT COUNT(*) FROM grw.db.t").head.getLong(0)
        == 10L)
      // publish: fast_forward main → wip, committed through REST too
      spark.sql("CALL grw.system.fast_forward('db.t', 'wip')")
      val (_, m2) = client.loadTable(Seq("db"), "t").get
      assert(m2.refs.get("main").snapshotId ==
        refs1("wip").snapshotId, "fast-forward did not reach the service")
      assert(spark.sql("SELECT COUNT(*) FROM grw.db.t").head.getLong(0)
        == 20L)
    } finally srv.stop()
  }

  test("diff/apply round-trips every engine commit shape") {
    val (srv, wh) = startServer()
    try {
      spark.conf.set("spark.sql.catalog.grd", "graft.connector.GraftCatalog")
      spark.conf.set("spark.sql.catalog.grd.uri", srv.uri)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS grd.db")
      spark.sql("""CREATE TABLE grd.db.t (id BIGINT, d DATE, v DOUBLE)
        PARTITIONED BY (months(d))
        TBLPROPERTIES('write.delete.mode'='merge-on-read',
          'write.delete.format'='deletion-vectors')""")
      spark.sql("""INSERT INTO grd.db.t
        SELECT id, DATE'2026-01-01' + CAST(id % 90 AS INT), CAST(id AS DOUBLE)
        FROM range(400)""")
      // every statement below exercises a different update vocabulary
      // through RestProtocol.diff's self-check (it throws if the update
      // list cannot reproduce the commit)
      // MoR DV delete: also exercises upgrade-format-version (v2 -> v3)
      // through the commit protocol
      spark.sql("DELETE FROM grd.db.t WHERE id < 20")
      spark.sql("ALTER TABLE grd.db.t ADD COLUMN tag STRING")  // schema
      // type promotion crosses the protocol as add-schema too: old
      // int-typed files still read after the widened schema commits
      spark.sql("ALTER TABLE grd.db.t ADD COLUMN cnt INT")
      spark.sql("ALTER TABLE grd.db.t ALTER COLUMN cnt TYPE BIGINT")
      spark.sql("ALTER TABLE grd.db.t SET TBLPROPERTIES ('k'='v')")
      spark.sql("ALTER TABLE grd.db.t UNSET TBLPROPERTIES ('k')")
      spark.sql("CALL grd.system.create_tag('db.t', 'audit')") // ref
      spark.sql("CALL grd.system.compact('db.t')")             // replace
      spark.sql("CALL grd.system.analyze_table('db.t')")       // stats
      spark.sql("CALL grd.system.expire_snapshots('db.t', 1)") // remove
      assert(spark.sql("SELECT COUNT(*) FROM grd.db.t").head.getLong(0)
        == 380L)
      val client = new GraftRestClient(srv.uri)
      val (_, meta) = client.loadTable(Seq("db"), "t").get
      assert(meta.refs.exists(_.contains("audit")))
      assert(meta.schemas.map(_.schemaId).max == 3)
      assert(meta.currentSchema.fieldByName("cnt")
        .exists(_.fieldType == graft.model.TLong),
        "type promotion did not cross the protocol")
      assert(meta.formatVersion == 3,
        "the DV delete's format bump did not cross the protocol")
    } finally srv.stop()
  }

  test("concurrent metadata evolutions conflict instead of lost-updating") {
    val (srv, _) = startServer()
    try {
      val client = new GraftRestClient(srv.uri)
      client.createNamespace(Seq("db"))
      spark.conf.set("spark.sql.catalog.gre", "graft.connector.GraftCatalog")
      spark.conf.set("spark.sql.catalog.gre.uri", srv.uri)
      spark.sql("CREATE TABLE gre.db.t (id BIGINT, v DOUBLE)")
      val (_, base) = client.loadTable(Seq("db"), "t").get

      // two schema evolutions built against the SAME base: without the
      // spec's assert-current-schema-id / assert-last-assigned-field-id
      // both would pass the uuid check and applyUpdates' replace-by-id
      // fold would silently drop the first commit's schema
      def evolved(colName: String): graft.model.TableMetadataV2 = {
        val cur = base.schemas.find(_.schemaId == base.currentSchemaId).get
        val next = cur.copy(schemaId = cur.schemaId + 1,
          fields = cur.fields :+ graft.model.StructField(
            base.lastColumnId + 1, colName, required = false,
            graft.model.TInt))
        base.copy(schemas = base.schemas :+ next,
          currentSchemaId = next.schemaId,
          lastColumnId = base.lastColumnId + 1)
      }
      def post(next: graft.model.TableMetadataV2): Unit = {
        val ups = RestProtocol.diff(base, next)
        client.commitTable(Seq("db"), "t",
          RestProtocol.requirementsFor(base, ups), ups)
      }
      post(evolved("a")) // first writer wins
      val err = intercept[CommitConflictException] { post(evolved("b")) }
      assert(err.getMessage.contains("schema") ||
        err.getMessage.contains("field"), err.getMessage)
      // the first evolution is intact, the loser left no trace
      val (_, after) = client.loadTable(Seq("db"), "t").get
      assert(after.currentSchemaId == base.currentSchemaId + 1)
      assert(after.schemas.exists(_.fields.exists(_.name == "a")))
      assert(!after.schemas.exists(_.fields.exists(_.name == "b")))
      // a rebased retry (fresh base) converges
      spark.sql("ALTER TABLE gre.db.t ADD COLUMN b INT")
      val (_, fin) = client.loadTable(Seq("db"), "t").get
      assert(fin.currentSchema.fields.map(_.name).toSet
        .intersect(Set("a", "b")) == Set("a", "b"))
    } finally srv.stop()
  }

  test("views through REST: one commit authority behind the protocol") {
    val (srv, _) = startServer()
    try {
      val client = new GraftRestClient(srv.uri)
      client.createNamespace(Seq("db"))
      spark.conf.set("spark.sql.catalog.grv", "graft.connector.GraftCatalog")
      spark.conf.set("spark.sql.catalog.grv.uri", srv.uri)
      spark.sql("CREATE TABLE grv.db.t (id BIGINT, v DOUBLE)")
      spark.sql("INSERT INTO grv.db.t SELECT id, CAST(id AS DOUBLE) " +
        "FROM range(100)")
      spark.sql("CREATE VIEW grv.db.big AS " +
        "SELECT id, v FROM grv.db.t WHERE id >= 50")
      // visible to a PLAIN REST client: the definition went through the
      // service, not around it onto local FS
      assert(client.listViews(Seq("db")) == Seq("big"))
      val (ver, st) = client.loadView(Seq("db"), "big").get
      assert(ver == 1 && st.current.sql.contains("id >= 50"))
      // a SECOND catalog instance over the same service serves it
      spark.conf.set("spark.sql.catalog.grv2",
        "graft.connector.GraftCatalog")
      spark.conf.set("spark.sql.catalog.grv2.uri", srv.uri)
      assert(spark.sql("SELECT COUNT(*) FROM grv2.db.big")
        .head.getLong(0) == 50L)
      assert(spark.sql("SHOW VIEWS IN grv2.db").collect()
        .map(_.getString(1)).toSet == Set("big"))
      // ALTER VIEW commits version 2 through the protocol
      spark.sql("ALTER VIEW grv.db.big SET TBLPROPERTIES ('k'='v')")
      val (v2, st2) = client.loadView(Seq("db"), "big").get
      assert(v2 == 2 && st2.current.properties.get("k").contains("v"))
      // a stale-base view commit 409s instead of lost-updating
      intercept[CommitConflictException] {
        client.commitView(Seq("db"), "big", baseVersion = 1, st2)
      }
      // rename through the protocol's /views/rename route
      spark.sql("ALTER VIEW grv.db.big RENAME TO grv.db.big2")
      assert(!client.viewExists(Seq("db"), "big"))
      assert(client.listViews(Seq("db")) == Seq("big2"))
      assert(spark.sql("SELECT COUNT(*) FROM grv2.db.big2")
        .head.getLong(0) == 50L)
      // DROP VIEW through the protocol
      spark.sql("DROP VIEW grv.db.big2")
      assert(!client.viewExists(Seq("db"), "big2"))
      assert(client.listViews(Seq("db")).isEmpty)

      // materialized view through REST: two-phase create — the backing
      // table stays INVISIBLE to REST clients until the tag commits,
      // then reads route to it; refresh re-commits through the protocol
      spark.sql("CREATE MATERIALIZED VIEW grv.db.mv AS " +
        "SELECT COUNT(*) AS n FROM grv.db.t")
      assert(spark.sql("SELECT n FROM grv2.db.mv").head.getLong(0)
        == 100L)
      assert(client.listViews(Seq("db")) == Seq("mv"))
      assert(client.listTables(Seq("db")).contains("mv"),
        "a TAGGED materialized view serves as a table over REST")
      spark.sql("INSERT INTO grv.db.t VALUES (1000, 1000.0)")
      spark.sql("CALL grv.system.refresh_mview('db.mv')")
      assert(spark.sql("SELECT n FROM grv2.db.mv").head.getLong(0)
        == 101L)
    } finally srv.stop()
  }

  test("atomic multi-table transaction: staged branches publish all-or-nothing") {
    val (srv, wh) = startServer()
    try {
      val client = new GraftRestClient(srv.uri)
      client.createNamespace(Seq("db"))
      spark.conf.set("spark.sql.catalog.grx", "graft.connector.GraftCatalog")
      spark.conf.set("spark.sql.catalog.grx.uri", srv.uri)
      spark.sql("CREATE TABLE grx.db.a (id BIGINT)")
      spark.sql("CREATE TABLE grx.db.b (id BIGINT)")
      spark.sql("INSERT INTO grx.db.a VALUES (1)")
      spark.sql("INSERT INTO grx.db.b VALUES (1)")
      import spark.implicits._
      def handle(t: String) = GraftTable.load(spark,
        java.nio.file.Paths.get(wh, "db", t).toString,
        new RestMetadataIo(client, Seq("db"), t))
      def count(t: String): Long =
        spark.sql(s"SELECT COUNT(*) FROM grx.db.$t").head.getLong(0)
      // stage ingest on per-table branches — ordinary commits, through
      // the protocol, invisible to main readers
      spark.sql("CALL grx.system.create_branch('db.a', 'txn')")
      spark.sql("CALL grx.system.create_branch('db.b', 'txn')")
      handle("a").appendToBranch("txn", Seq(2L, 3L).toDF("id"))
      handle("b").appendToBranch("txn", Seq(2L).toDF("id"))
      assert(count("a") == 1 && count("b") == 1, "staging leaked to main")
      // ONE atomic transaction publishes both
      val out = spark.sql(
        "CALL grx.system.publish_transaction('db.a,db.b', 'txn')").head
      assert(out.getLong(0) == 2L)
      assert(count("a") == 3 && count("b") == 2)

      // all-or-nothing: a's slice is valid, b's requirement is stale —
      // the transaction 409s and NEITHER table moves
      handle("a").appendToBranch("txn", Seq(10L).toDF("id"))
      handle("b").appendToBranch("txn", Seq(10L).toDF("id"))
      def slice(t: String, breakIt: Boolean) = {
        val (_, meta) = client.loadTable(Seq("db"), t).get
        val refs = meta.refs.get
        val upd = graft.model.Json.obj
        upd.put("action", "set-snapshot-ref")
        upd.put("ref-name", "main")
        upd.put("type", "branch")
        upd.put("snapshot-id", refs("txn").snapshotId)
        val req = graft.model.Json.obj
        req.put("type", "assert-ref-snapshot-id")
        req.put("ref", "main")
        req.put("snapshot-id",
          if (breakIt) -1L else refs("main").snapshotId)
        GraftRestClient.TxnChange(Seq("db"), t, Seq(req), Seq(upd))
      }
      intercept[CommitConflictException] {
        client.commitTransaction(
          Seq(slice("a", breakIt = false), slice("b", breakIt = true)))
      }
      assert(count("a") == 3 && count("b") == 2,
        "a partially-failed transaction must move NOTHING")

      // diverged branch refuses (fast-forward rule, per table)
      spark.sql("INSERT INTO grx.db.b VALUES (99)")
      val err = intercept[Exception] { spark.sql(
        "CALL grx.system.publish_transaction('db.a,db.b', 'txn')")
        .collect() }
      assert(err.getMessage.contains("not an ancestor"), err.getMessage)
      assert(count("a") == 3, "refusal must not publish the valid table")
      // the still-clean table publishes alone
      spark.sql("CALL grx.system.publish_transaction('db.a', 'txn')")
      assert(count("a") == 4)
    } finally srv.stop()
  }

  test("expiry pins a staged branch's lineage so publish still " +
      "fast-forwards") {
    val (srv, wh) = startServer()
    try {
      val client = new GraftRestClient(srv.uri)
      client.createNamespace(Seq("db"))
      spark.conf.set("spark.sql.catalog.grp", "graft.connector.GraftCatalog")
      spark.conf.set("spark.sql.catalog.grp.uri", srv.uri)
      spark.sql("CREATE TABLE grp.db.t (id BIGINT)")
      spark.sql("INSERT INTO grp.db.t VALUES (1)")
      import spark.implicits._
      val h = GraftTable.load(spark,
        java.nio.file.Paths.get(wh, "db", "t").toString,
        new RestMetadataIo(client, Seq("db"), "t"))
      // stage THREE commits on the branch, then expire aggressively:
      // keepLast=1 would previously collect the intermediate staged
      // commits, breaking the publish-time ancestor walk into a false
      // conflict — expiry must pin the branch-head→main lineage
      spark.sql("CALL grp.system.create_branch('db.t', 'txn')")
      h.appendToBranch("txn", Seq(2L).toDF("id"))
      h.appendToBranch("txn", Seq(3L).toDF("id"))
      h.appendToBranch("txn", Seq(4L).toDF("id"))
      GraftTable.load(spark,
        java.nio.file.Paths.get(wh, "db", "t").toString,
        new RestMetadataIo(client, Seq("db"), "t"))
        .expireSnapshots(keepLast = 1)
      val (_, meta) = client.loadTable(Seq("db"), "t").get
      val branchHead = meta.refs.get("txn").snapshotId
      // the staged lineage survived the expiry...
      def chainLen(from: Long): Int =
        Iterator.iterate(Option(from))(c => c.flatMap(id =>
          meta.snapshotById(id).flatMap(_.parentSnapshotId)))
          .takeWhile(_.isDefined).size
      assert(chainLen(branchHead) == 4,
        s"staged lineage was expired (${meta.snapshots.get.size} kept)")
      // ...so the publish fast-forwards instead of false-conflicting
      spark.sql("CALL grp.system.publish_transaction('db.t', 'txn')")
      assert(spark.sql("SELECT COUNT(*) FROM grp.db.t").head.getLong(0)
        == 4L)
    } finally srv.stop()
  }

  test("multi-level namespaces through the protocol") {
    val (srv, _) = startServer()
    try {
      val client = new GraftRestClient(srv.uri)
      spark.conf.set("spark.sql.catalog.grn", "graft.connector.GraftCatalog")
      spark.conf.set("spark.sql.catalog.grn.uri", srv.uri)
      spark.sql("CREATE NAMESPACE grn.a")
      spark.sql("CREATE NAMESPACE grn.a.b")
      spark.sql("CREATE TABLE grn.a.b.t (id BIGINT)")
      spark.sql("INSERT INTO grn.a.b.t VALUES (1)")
      assert(client.listNamespaces() == Seq(Seq("a")),
        "top-level listing must not descend")
      assert(client.listNamespaces(Seq("a")) == Seq(Seq("a", "b")))
      // a table dir is a table, not a namespace
      assert(client.listNamespaces(Seq("a", "b")).isEmpty)
      assert(spark.sql("SHOW NAMESPACES IN grn.a").collect()
        .map(_.getString(0)).toSeq == Seq("a.b"))
      assert(spark.sql("SELECT COUNT(*) FROM grn.a.b.t")
        .head.getLong(0) == 1L)
      // cascade drop flows through the protocol: tables, views, child
      // namespaces, then the namespace itself
      spark.sql("DROP NAMESPACE grn.a CASCADE")
      assert(!client.namespaceExists(Seq("a")))
      assert(!client.namespaceExists(Seq("a", "b")))
    } finally srv.stop()
  }

  test("names containing spaces and '+' round-trip through the client") {
    val (srv, _) = startServer()
    try {
      val client = new GraftRestClient(srv.uri)
      // URLEncoder form-encodes a space as '+', which the server's
      // raw-path decode treats as the literal char — the client must
      // emit %20 so both characters survive end to end
      client.createNamespace(Seq("a b"))
      client.createNamespace(Seq("a b", "c+d"))
      assert(client.namespaceExists(Seq("a b")))
      assert(client.listNamespaces() == Seq(Seq("a b")))
      // parent listing goes through the ?parent= query decode
      assert(client.listNamespaces(Seq("a b")) == Seq(Seq("a b", "c+d")))
      assert(client.namespaceExists(Seq("a b", "c+d")))
      val schema = graft.model.SchemaV2(0, None, None, Seq(
        graft.model.StructField(1, "id", required = false,
          graft.model.TLong)))
      client.createTable(Seq("a b", "c+d"), "t 1", schema, None, Map.empty)
      assert(client.listTables(Seq("a b", "c+d")) == Seq("t 1"))
      assert(client.tableExists(Seq("a b", "c+d"), "t 1"))
      assert(client.loadTable(Seq("a b", "c+d"), "t 1").isDefined)
      assert(client.dropTable(Seq("a b", "c+d"), "t 1"))
      assert(client.dropNamespace(Seq("a b", "c+d")))
      assert(client.dropNamespace(Seq("a b")))
    } finally srv.stop()
  }

  test("set-snapshot-ref rollback keeps the snapshot-log monotonic") {
    val (srv, _) = startServer()
    try {
      val client = new GraftRestClient(srv.uri)
      client.createNamespace(Seq("db"))
      spark.conf.set("spark.sql.catalog.grl", "graft.connector.GraftCatalog")
      spark.conf.set("spark.sql.catalog.grl.uri", srv.uri)
      spark.sql("CREATE TABLE grl.db.t (id BIGINT)")
      spark.sql("INSERT INTO grl.db.t VALUES (1)")
      Thread.sleep(5)
      spark.sql("INSERT INTO grl.db.t VALUES (2)")
      val (_, meta) = client.loadTable(Seq("db"), "t").get
      val snaps = meta.snapshots.get.sortBy(_.sequenceNumber)
      // roll main back to the FIRST snapshot: the appended log entry
      // records when main MOVED (server time), not the old snapshot's
      // creation time — the log stays monotonic per the metadata spec
      val u = graft.model.Json.obj
      u.put("action", "set-snapshot-ref")
      u.put("ref-name", "main")
      u.put("type", "branch")
      u.put("snapshot-id", snaps.head.snapshotId)
      val before = System.currentTimeMillis
      val after = RestProtocol.applyUpdates(meta, Seq(u))
      val log = after.snapshotLog.get
      assert(log.last.snapshotId == snaps.head.snapshotId)
      assert(log.last.timestampMs >= before,
        "rollback log entry must carry the move time")
      assert(log.map(_.timestampMs) == log.map(_.timestampMs).sorted,
        s"snapshot-log timestamps not monotonic: $log")
    } finally srv.stop()
  }
}
