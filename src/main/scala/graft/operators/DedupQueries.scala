package graft.operators

import graft.QueryDef

object DedupQueries {
  def defs: Seq[QueryDef] = Seq()
}
