package graft.streaming

import graft.GraftQuery

object StreamingQueries {
  def queries: Seq[GraftQuery] = Seq.empty
}
