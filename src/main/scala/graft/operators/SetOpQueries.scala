package graft.operators

import graft.QueryDef

object SetOpQueries {
  def defs: Seq[QueryDef] = Seq()
}
