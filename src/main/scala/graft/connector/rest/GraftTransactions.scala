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
      // walk parent links from the branch head. The walk can end three
      // ways: main found (ok); chain bottomed out on retained
      // snapshots without main (proven divergence — rebase); or a
      // parent link points at an EXPIRED snapshot. In the expired case
      // the commit's recorded parent-sequence-number can still REFUTE
      // (sequences strictly decrease down any lineage, so a break
      // strictly below main's sequence proves main was never on it),
      // but never confirm — so an ambiguous break refuses with an
      // expiry-specific message. The engine's expire_snapshots pins a
      // live branch's unpublished lineage down to main precisely so
      // this case only arises from external/foreign expiry.
      mainRef.foreach { m =>
        val mainSeq = meta.snapshotById(m.snapshotId).map(_.sequenceNumber)
        var cur = meta.snapshotById(branchRef.snapshotId)
        var ok = cur.exists(_.snapshotId == m.snapshotId)
        var broken: Option[(Long, Option[Long])] = None
        while (!ok && cur.isDefined && broken.isEmpty) {
          val s = cur.get
          s.parentSnapshotId match {
            case None => cur = None
            case Some(p) if p == m.snapshotId => ok = true
            case Some(p) => meta.snapshotById(p) match {
              case some @ Some(_) => cur = some
              case None => broken = Some((p,
                s.summary.other.get("parent-sequence-number").map(_.toLong)))
            }
          }
        }
        if (!ok) broken match {
          case Some((p, ps))
              if !ps.exists(s => mainSeq.exists(s < _)) =>
            throw new IllegalStateException(s"$ident: cannot verify " +
              s"that main is an ancestor of $branch — ancestor " +
              s"snapshot $p expired before publish. Re-stage the " +
              "branch, or keep the staged lineage retained until " +
              "publish (graft's expire_snapshots does; this table was " +
              "expired externally)")
          case _ =>
            throw new IllegalArgumentException(
              s"$ident: main is not an ancestor of $branch — the " +
                "branch must be rebased (re-staged), not force-published")
        }
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
