package graft.util

import org.apache.spark.sql.SparkSession

/** CONTENT-derived corpus identity: the directory plus an md5 over a
  * table's parquet file listing (name, length, mtime). The freshness
  * key every persisted derivation (search index, components artifact)
  * stamps and demands: a corpus regenerated IN PLACE at the same path
  * (the driver regenerates /root/testdata between rounds) changes the
  * fingerprint, so a cached artifact built from the old contents
  * fails its freshness check and rebuilds — the path alone would pass
  * and silently serve stale results.
  */
object ContentVersion {

  def of(s: SparkSession, dir: String,
         table: String = "documents"): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val listing = fs.listStatus(p)
      .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .sorted.mkString("\n")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(listing.getBytes("UTF-8"))
    dir + "@" + md5.map("%02x".format(_)).mkString.take(16)
  }
}
