package graft.operators

import graft.QueryDef

object FilterQueries {
  def defs: Seq[QueryDef] = Seq()
}
