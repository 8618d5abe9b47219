package graft.operators

import graft.QueryDef

object DdlDmlQueries {
  def defs: Seq[QueryDef] = Seq()
}
