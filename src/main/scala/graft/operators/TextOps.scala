package graft.operators

import graft.GraftQuery

object TextOps {
  def queries: Seq[GraftQuery] = Seq.empty
}
