package graft.model

import java.sql.Date

/** Parsed MEDLINE publication record — the P1/P2 output schema
  * (reference main.py:306-328; field inventory also in the BQ schema at
  * main.py:35-68 and FIXTURES.md §1).
  *
  * `is_deleted=true` rows are DeleteCitation tombstones carrying only
  * pub_id + filename (reference main.py:298-305).
  */
final case class Author(
    LastName: Option[String] = None,
    ForeName: Option[String] = None,
    Initials: Option[String] = None,
    CollectiveName: Option[String] = None,
    Affiliation: Option[String] = None,
    short_name: Option[String] = None,
    full_name: Option[String] = None,
)

final case class Journal(
    title: Option[String] = None,
    medlineAbbreviation: Option[String] = None,
)

final case class JournalReference(
    volume: Option[String] = None,
    issue: Option[String] = None,
    pgn: Option[String] = None,
)

final case class MeshHeading(id: Option[String], label: Option[String])

final case class Chemical(
    name: Option[String] = None,
    name_id: Option[String] = None,
    registryNumber: Option[String] = None,
)

final case class Publication(
    pub_id: String,
    title: Option[String] = None,
    abstractText: Option[String] = None, // "abstract" in reference JSON; renamed at sink (reserved in Java)
    authors: Seq[Author] = Seq.empty,
    pub_date: Option[Date] = None,
    date: Option[Date] = None, // first_publication_date (DateCreated)
    journal: Option[Journal] = None,
    journal_reference: Option[JournalReference] = None,
    full_text: String = "",
    keywords: Seq[String] = Seq.empty,
    doi: Option[String] = None,
    pub_type: Seq[String] = Seq.empty,
    filename: String = "",
    mesh_headings: Seq[MeshHeading] = Seq.empty,
    chemicals: Seq[Chemical] = Seq.empty,
    is_deleted: Boolean = false,
) {
  /** Projection analyzed by NLP: title + ' ' + abstract, or title, or ""
    * (reference main.py:429-437). */
  def textToAnalyze: String = (title, abstractText) match {
    case (Some(t), Some(a)) => s"$t $a"
    case (Some(t), None) => t
    case _ => ""
  }
}
