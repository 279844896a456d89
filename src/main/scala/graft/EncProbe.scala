package graft
import org.apache.hadoop.fs.Path
import graft.fls._

object EncProbe {
  def main(args: Array[String]): Unit = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val files = FlsFile.listDataStatuses(new Path("/tmp/fls_scale/lineitem64x"), conf)
    val entry = FlsFooters.list(Seq("/tmp/fls_scale/lineitem64x"), conf, None).head
    val t = entry.table
    val encName = Map(0->"PLAIN",1->"CONST",2->"FFOR",3->"DICT",4->"RLE",5->"ALP",6->"FSST",
      7->"FSST_DICT",8->"FREQ",9->"ALP_RD",10->"FSST12",11->"FSST12_DICT",12->"EQUAL",13->"TRANSPOSED")
    t.columns.zipWithIndex.foreach { case (c, i) =>
      val encs = t.rowGroups.map(_.segments(i).encoding).groupBy(identity)
        .map { case (e, xs) => s"${encName.getOrElse(e, e.toString)}x${xs.length}" }.mkString(",")
      val bytes = t.rowGroups.map(_.segments(i).length).sum
      println(f"[enc] ${c.name}%-18s $encs%-24s ${bytes / 1e6}%8.1f MB  nGroups=${t.rowGroups.length}")
    }
  }
}
