package graft.connector.rest

import graft.model.Json

/** Multi-table atomic publish over the REST transaction endpoint: the
  * write-audit-publish pattern lifted to N tables. Data lands on a
  * staging BRANCH of each table through ordinary commits (retryable,
  * parallel, invisible to main readers), then ONE transaction swings
  * every table's main ref to its branch head — metadata-only, and
  * all-or-nothing under the catalog service's serial commit dispatch.
  * This is the shape that survives 100 TB: the transaction itself
  * never moves data, however large the staged ingest was.
  *
  * Per-table requirements: table uuid, main at its read position (a
  * concurrent main commit conflicts), and the branch at its read head
  * (a concurrent staging commit conflicts). The same ancestor rule as
  * the engine's single-table fastForward applies — a branch whose
  * history diverged from main refuses rather than silently dropping
  * main's commits.
  */
private[graft] object GraftTransactions {

  /** Publish each (namespace, table, branch) atomically. Throws
    * [[graft.table.CommitConflictException]] when any table's
    * requirements fail — then NO table moved.
    */
  def publishBranches(client: GraftRestClient,
      tables: Seq[(Seq[String], String, String)]): Unit = {
    require(tables.nonEmpty, "nothing to publish")
    val changes = tables.map { case (ns, name, branch) =>
      val ident = (ns :+ name).mkString(".")
      val (_, meta) = client.loadTable(ns, name).getOrElse(
        throw new IllegalArgumentException(s"no table $ident"))
      val refs = meta.refs.getOrElse(Map.empty)
      val branchRef = refs.getOrElse(branch,
        throw new IllegalArgumentException(s"$ident has no ref $branch"))
      val mainRef = refs.get("main")
      // main must be an ancestor of the branch head (fast-forward):
      // walk parent links from the branch head
      mainRef.foreach { m =>
        var cur: Option[Long] = Some(branchRef.snapshotId)
        var ok = false
        while (cur.isDefined && !ok) {
          if (cur.contains(m.snapshotId)) ok = true
          else cur = meta.snapshotById(cur.get)
            .flatMap(_.parentSnapshotId)
        }
        require(ok, s"$ident: main is not an ancestor of $branch — " +
          "the branch must be rebased (re-staged), not force-published")
      }
      val upd = Json.obj
      upd.put("action", "set-snapshot-ref")
      upd.put("ref-name", "main")
      upd.put("type", "branch")
      upd.put("snapshot-id", branchRef.snapshotId)
      val reqs = Seq(("main", mainRef.map(_.snapshotId)),
        (branch, Some(branchRef.snapshotId))).map { case (ref, snap) =>
        val o = Json.obj
        o.put("type", "assert-ref-snapshot-id")
        o.put("ref", ref)
        snap match {
          case Some(s) => o.put("snapshot-id", s)
          case None => o.putNull("snapshot-id")
        }
        o
      }
      val uuid = Json.obj
      uuid.put("type", "assert-table-uuid")
      uuid.put("uuid", meta.tableUuid)
      GraftRestClient.TxnChange(ns, name, uuid +: reqs, Seq(upd))
    }
    client.commitTransaction(changes)
  }
}
