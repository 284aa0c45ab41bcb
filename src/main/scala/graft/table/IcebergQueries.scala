package graft.table

import graft.GraftQuery

object IcebergQueries {
  def queries: Seq[GraftQuery] = Seq.empty
}
