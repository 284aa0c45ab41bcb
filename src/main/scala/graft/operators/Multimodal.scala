package graft.operators

import graft.GraftQuery

object Multimodal {
  def queries: Seq[GraftQuery] = Seq.empty
}
