package graft.operators

import graft.QueryDef

object MultimodalQueries {
  def defs: Seq[QueryDef] = Seq()
}
