package graft.operators

import graft.GraftQuery

object Dedup {
  def queries: Seq[GraftQuery] = Seq.empty
}
