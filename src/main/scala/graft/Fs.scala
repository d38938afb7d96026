package graft

/** Local-filesystem helpers for the bench/verify mains (their temp
  * fixtures live on java.io paths; engine code goes through Hadoop
  * FileSystem instead).
  */
private[graft] object Fs {
  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmTree)
    f.delete()
    ()
  }
}
