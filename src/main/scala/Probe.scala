object Probe {
  def main(a: Array[String]): Unit = {
    val th = graft.datapipe.Hashing.tokenHashes("a b c")
    println("tokenHashes: " + th.map(java.lang.Long.toUnsignedString).mkString(","))
    val sh = graft.datapipe.Hashing.shingleSet("a b c", 3)
    println("shingleSet: " + sh.map(java.lang.Long.toUnsignedString).mkString(","))
    val sig = graft.datapipe.Hashing.minhash(sh, 8)
    println("minhash8: " + sig.map(java.lang.Long.toUnsignedString).mkString(","))
    val bk = graft.datapipe.Hashing.bandKeys(sig, 2)
    println("bandKeys2: " + bk.map(java.lang.Long.toUnsignedString).mkString(","))
    println("mix64(0): " + java.lang.Long.toUnsignedString(graft.datapipe.Hashing.mix64(0L)))
    println("fnv64(abc): " + java.lang.Long.toUnsignedString(graft.datapipe.Hashing.fnv64("abc")))
  }
}
