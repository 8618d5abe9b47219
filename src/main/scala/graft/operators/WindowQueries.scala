package graft.operators

import graft.QueryDef

object WindowQueries {
  def defs: Seq[QueryDef] = Seq()
}
