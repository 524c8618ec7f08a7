package graft.ops

import java.io.{BufferedWriter, FileOutputStream, OutputStreamWriter}
import java.util.zip.GZIPOutputStream

/** Deterministic synthetic-MEDLINE generator (SURVEY §6: bench harness =
  * driver testdata + a synthetic-MEDLINE generator). Produces
  * `pubmedYYnNNNN.xml.gz` baseline/update files in the reference's
  * citation format (FIXTURES.md §1) with a seeded xorshift stream —
  * same args ⇒ byte-identical corpus.
  *
  * Usage: runMain graft.ops.MedlineGen <outDir> <nFiles> <citationsPerFile>
  * Update files (every 5th) revise earlier PMIDs and carry a
  * DeleteCitation tombstone block.
  */
object MedlineGen {

  private val titles = Vector("Asthma", "Schizophrenia", "Autism", "Cancer",
    "Parkinson's disease", "Alzheimer's disease", "Fanconi anemia",
    "bipolar disorder", "depression", "airway inflammation")
  private val genes = Vector("ADRA1A", "PPP3CC", "NRG1", "FGF17", "FGFR1",
    "PLK1", "c-ABL", "SFRP1", "CHRNA2", "DKK4")
  private val verbs = Vector("is characterized by", "is associated with",
    "regulates", "reduces", "induces", "prevents", "affects")
  private val nouns = Vector("bone marrow failure", "cancer risk",
    "chronic disease", "neuropsychiatric disorders", "tumor growth",
    "cell proliferation", "motor deficits", "inflammation",
    "oxidative stress", "synaptic plasticity")

  final class Rng(seed0: Long) {
    private var s = if (seed0 == 0) 0x9e3779b97f4a7c15L else seed0
    def nextLong(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
    def nextInt(n: Int): Int = ((nextLong() >>> 1) % n).toInt
    def pick[T](v: Vector[T]): T = v(nextInt(v.length))
  }

  def citation(pmid: Long, rng: Rng, version: Int): String = {
    val title = s"${rng.pick(titles)} and ${rng.pick(genes)}: " +
      s"implications for ${rng.pick(nouns)} (v$version)."
    val nSent = 3 + rng.nextInt(5)
    val abstractText = (0 until nSent).map { _ =>
      s"${rng.pick(genes)} ${rng.pick(verbs)} ${rng.pick(nouns)} in " +
        s"${rng.pick(titles).toLowerCase}"
    }.mkString(". ") + "."
    val year = 1990 + rng.nextInt(30)
    val month = 1 + rng.nextInt(12)
    val day = 1 + rng.nextInt(28)
    s"""<MedlineCitation Owner="NLM" Status="MEDLINE">
       |<PMID Version="1">$pmid</PMID>
       |<DateCreated><Year>$year</Year><Month>$month</Month><Day>$day</Day></DateCreated>
       |<Article PubModel="Print">
       |<Journal>
       |<JournalIssue CitedMedium="Print"><Volume>${1 + rng.nextInt(99)}</Volume><Issue>${1 + rng.nextInt(12)}</Issue><PubDate><Year>$year</Year><Month>$month</Month></PubDate></JournalIssue>
       |<Title>Journal of Synthetic Biomedicine</Title>
       |<ISOAbbreviation>J Synth Biomed</ISOAbbreviation>
       |</Journal>
       |<ArticleTitle>${title}</ArticleTitle>
       |<Pagination><MedlinePgn>${1 + rng.nextInt(999)}-${1000 + rng.nextInt(999)}</MedlinePgn></Pagination>
       |<Abstract><AbstractText>${abstractText}</AbstractText></Abstract>
       |<AuthorList CompleteYN="Y"><Author ValidYN="Y"><LastName>Smith</LastName><ForeName>Jane</ForeName><Initials>J</Initials></Author></AuthorList>
       |<PublicationTypeList><PublicationType UI="D016428">Journal Article</PublicationType></PublicationTypeList>
       |</Article>
       |<ChemicalList><Chemical><RegistryNumber>0</RegistryNumber><NameOfSubstance UI="D00${rng.nextInt(999)}">${rng.pick(nouns)}</NameOfSubstance></Chemical></ChemicalList>
       |<MeshHeadingList><MeshHeading><DescriptorName UI="D00${rng.nextInt(999)}" MajorTopicYN="N">${rng.pick(titles)}</DescriptorName></MeshHeading></MeshHeadingList>
       |</MedlineCitation>""".stripMargin
  }

  def writeFile(path: String, pmids: Seq[Long], deletePmids: Seq[Long],
      seed: Long, version: Int): Unit = {
    val rng = new Rng(seed)
    val out = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(new FileOutputStream(path)), "UTF-8"))
    out.write("<?xml version=\"1.0\"?>\n<MedlineCitationSet>\n")
    pmids.foreach { pmid => out.write(citation(pmid, rng, version)); out.write("\n") }
    if (deletePmids.nonEmpty) {
      out.write("<DeleteCitation>\n")
      deletePmids.foreach(p => out.write(s"""<PMID Version="1">$p</PMID>\n"""))
      out.write("</DeleteCitation>\n")
    }
    out.write("</MedlineCitationSet>\n")
    out.close()
  }

  /** Generates nFiles; every 5th file is an "update" revising 20% of an
    * earlier file's PMIDs and deleting 2. Returns expected surviving
    * count. */
  def generate(outDir: String, nFiles: Int, perFile: Int, seed: Long = 42L): Long = {
    new java.io.File(outDir).mkdirs()
    var nextPmid = 10000000L
    val filePmids = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val deleted = scala.collection.mutable.Set.empty[Long]
    for (i <- 0 until nFiles) {
      val name = f"pubmed20n$i%04d.xml.gz"
      if (i % 5 == 4 && i > 0) {
        // update file: revise PMIDs from file i-4, delete 2 of them
        val base = filePmids(i - 4)
        val nRevise = math.max(1, base.length / 5)
        val toRevise = base.take(nRevise)
        val toDelete = base.slice(nRevise, nRevise + 2)
        writeFile(s"$outDir/$name", toRevise, toDelete, seed + i, version = 2)
        filePmids += toRevise
        deleted ++= toDelete
      } else {
        val pmids = (0 until perFile).map(_ => { nextPmid += 1; nextPmid })
        writeFile(s"$outDir/$name", pmids, Nil, seed + i, version = 1)
        filePmids += pmids
      }
    }
    val all = filePmids.flatten.toSet
    (all -- deleted).size.toLong
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.lift(0).getOrElse("/tmp/medline_synth")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(20)
    val perFile = args.lift(2).map(_.toInt).getOrElse(500)
    val expected = generate(outDir, nFiles, perFile)
    println(s"""{"files": $nFiles, "citations_per_file": $perFile, "expected_survivors": $expected, "dir": "$outDir"}""")
  }
}
