package graft.operators

import graft.QueryDef

object TextQueries {
  def defs: Seq[QueryDef] = Seq()
}
