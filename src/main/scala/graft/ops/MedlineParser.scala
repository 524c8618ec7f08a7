package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model._

import scala.util.Try
import scala.xml.{Elem, Node, XML}

/** MEDLINE citation XML fragment → publication records (SURVEY §2.2
  * P1/P2; reference main.py:235-426).
  *
  * flatMap semantics: a `<DeleteCitation>` yields one tombstone per
  * listed PMID; an unparseable fragment yields nothing (reference
  * main.py:298-305, 330-338).
  */
object MedlineParser {

  def parseFragment(fragment: String, fileName: String): Seq[Publication] = {
    val rootTry = Try(XML.loadString(fragment))
    if (rootTry.isFailure) return Seq.empty
    val root = rootTry.get
    root.label match {
      case "DeleteCitation" =>
        (root \ "PMID").map(p => Publication(
          pub_id = p.text, filename = fileName, is_deleted = true))
      case "MedlineCitation" =>
        Try(parseCitation(root, fileName)).toOption.toSeq
      case _ => Seq.empty
    }
  }

  private def textOpt(n: Node): Option[String] = {
    val t = n.text
    if (t == null || t.isEmpty) None else Some(t)
  }
  private def firstText(n: Node, path: String): Option[String] =
    (n \ path).headOption.flatMap(textOpt)

  private def parseCitation(medline: Elem, fileName: String): Publication = {
    val pmid = firstText(medline, "PMID").getOrElse(
      throw new IllegalArgumentException("no PMID"))

    // DateCreated → first_publication_date (main.py:243-252); missing
    // day → '1'. Missing Month defaults to Jan like the PubDate path —
    // a documented deviation: the reference accesses child.Month.text
    // unguarded, so a month-less DateCreated drops the whole record.
    val firstPubDate = (medline \ "DateCreated").headOption.flatMap { dc =>
      MedlineDates.parse(
        firstText(dc, "Year").getOrElse(""),
        firstText(dc, "Month").getOrElse("Jan"),
        firstText(dc, "Day").getOrElse("1"))
    }

    val articleOpt = (medline \ "Article").headOption

    val title = articleOpt.flatMap(a => firstText(a, "ArticleTitle"))

    // Abstract: concatenation of non-empty AbstractText nodes (main.py:346-351)
    val abstractText = articleOpt.flatMap { a =>
      val parts = (a \ "Abstract" \ "AbstractText").flatMap(textOpt)
      if (parts.isEmpty) None else Some(parts.mkString(" "))
    }

    // Journal title + ISO abbreviation. The reference has an iteration-order
    // bug (main.py:358-361) that blanks medlineAbbreviation unless
    // ISOAbbreviation is the last child; net effect on real MEDLINE =
    // abbreviation when present else "". We implement that net semantics.
    val journal = articleOpt.flatMap(a => (a \ "Journal").headOption).map { j =>
      Journal(
        title = firstText(j, "Title"),
        medlineAbbreviation = Some(firstText(j, "ISOAbbreviation").getOrElse("")))
    }

    // PubDate with defaults 1800/Jan/1 (main.py:363-377)
    val journalIssue = articleOpt.flatMap(a => (a \ "Journal" \ "JournalIssue").headOption)
    val pubDate = journalIssue.flatMap { ji =>
      (ji \ "PubDate").headOption.flatMap { pd =>
        val medlineDate = firstText(pd, "MedlineDate")
        val (y, m, d) = (
          firstText(pd, "Year"),
          firstText(pd, "Month"),
          firstText(pd, "Day"))
        if (y.isEmpty && m.isEmpty && d.isEmpty && medlineDate.isDefined) {
          // e.g. "2000 Nov-Dec" / "1998 Dec-1999 Jan"
          val parts = medlineDate.get.split("[\\s]+")
          MedlineDates.parse(
            parts.headOption.getOrElse("1800"),
            parts.lift(1).getOrElse("Jan"), "1")
        } else {
          MedlineDates.parse(y.getOrElse("1800"), m.getOrElse("Jan"), d.getOrElse("1"))
        }
      }
    }

    val journalRef = {
      val volume = journalIssue.flatMap(ji => firstText(ji, "Volume"))
      val issue = journalIssue.flatMap(ji => firstText(ji, "Issue"))
      val pgn = articleOpt.flatMap(a =>
        (a \ "Pagination" \ "MedlinePgn").headOption.flatMap(textOpt))
      if (volume.isEmpty && issue.isEmpty && pgn.isEmpty) None
      else Some(JournalReference(volume = volume, issue = issue, pgn = pgn))
    }

    val pubTypes = articleOpt.toSeq
      .flatMap(a => a \ "PublicationTypeList" \ "PublicationType")
      .flatMap(textOpt)

    val doi = articleOpt.flatMap { a =>
      (a \ "ELocationID").find(e => (e \@ "EIdType") == "doi").flatMap(textOpt)
    }

    // Authors with short/full name synthesis (main.py:396-421)
    val authors = articleOpt.toSeq.flatMap(a => a \ "AuthorList" \ "Author").map { au =>
      val last = firstText(au, "LastName")
      val fore = firstText(au, "ForeName")
      val initials = firstText(au, "Initials")
      val collective = firstText(au, "CollectiveName")
      val affiliation = (au \ "AffiliationInfo" \ "Affiliation").headOption.flatMap(textOpt)
      Author(
        LastName = last, ForeName = fore, Initials = initials,
        CollectiveName = collective, Affiliation = affiliation,
        short_name = last.map(l => initials.map(i => s"$l $i").getOrElse(l)),
        full_name = last.map(l => fore.map(f => s"$l $f").getOrElse(l)))
    }

    val chemicals = (medline \ "ChemicalList" \ "Chemical").map { ch =>
      Chemical(
        name = (ch \ "NameOfSubstance").headOption.flatMap(textOpt),
        name_id = (ch \ "NameOfSubstance").headOption.map(_ \@ "UI").filter(_.nonEmpty),
        registryNumber = firstText(ch, "RegistryNumber"))
    }

    val keywords = (medline \ "KeywordList" \ "Keyword").flatMap(textOpt)

    val meshHeadings = (medline \ "MeshHeadingList" \ "MeshHeading").map { mh =>
      val desc = (mh \ "DescriptorName").headOption
      MeshHeading(
        id = desc.map(_ \@ "UI").filter(_.nonEmpty),
        label = desc.flatMap(textOpt))
    }

    Publication(
      pub_id = pmid,
      title = title,
      abstractText = abstractText,
      authors = authors,
      pub_date = pubDate,
      date = firstPubDate,
      journal = journal,
      journal_reference = journalRef,
      full_text = "",
      keywords = keywords,
      doi = doi,
      pub_type = pubTypes,
      filename = fileName,
      mesh_headings = meshHeadings,
      chemicals = chemicals,
      is_deleted = false)
  }

  /** Distributed parse: fragments → publications. */
  def parse(spark: SparkSession, fragments: Dataset[(String, String)]): Dataset[Publication] = {
    import spark.implicits._
    fragments.flatMap { case (frag, file) => parseFragment(frag, file) }
  }
}
