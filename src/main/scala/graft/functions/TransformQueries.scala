package graft.functions

import graft.GraftQuery

object TransformQueries {
  def queries: Seq[GraftQuery] = Seq.empty
}
