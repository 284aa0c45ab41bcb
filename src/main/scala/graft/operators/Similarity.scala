package graft.operators

import graft.GraftQuery

object Similarity {
  def queries: Seq[GraftQuery] = Seq.empty
}
