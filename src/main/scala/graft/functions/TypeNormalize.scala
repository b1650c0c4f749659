package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Publication-type normalization — the ~140-entry mapping from
  * /root/reference/rialto_airflow/distiller/types.py (`type_mapping` /
  * `_normalize_type`): lowercase lookup, falling back to
  * `str.capitalize()` semantics (first char upper, rest lower).
  *
  * The mapping ships as a literal MapType column, so normalization is an
  * `element_at` inside whole-stage codegen — effectively a broadcast
  * dictionary join with zero shuffle.
  */
object TypeNormalize {

  val mapping: Map[String, String] = Map(
    "autobiography" -> "Book",
    "book" -> "Book",
    "book-chapter" -> "Chapter",
    "book-part" -> "Chapter",
    "book-section" -> "Chapter",
    "book-series" -> "Other",
    "book-set" -> "Other",
    "clinical conference" -> "Other",
    "clinical study" -> "Other",
    "clinical trial" -> "Other",
    "clinical trial protocol" -> "Other",
    "clinical trial, phase i" -> "Other",
    "clinical trial, phase ii" -> "Other",
    "clinical trial, phase iii" -> "Other",
    "clinical trial, phase iv" -> "Other",
    "comment" -> "Other",
    "component" -> "Other",
    "comparative study" -> "Other",
    "consensus development conference" -> "Other",
    "consensus development conference, nih" -> "Other",
    "controlled clinical trial" -> "Other",
    "database" -> "Other",
    "dataset" -> "Dataset",
    "dissertation" -> "Dissertation",
    "edited-book" -> "Book",
    "english abstract" -> "Other",
    "equivalence trial" -> "Other",
    "evaluation study" -> "Other",
    "guideline" -> "Other",
    "historical article" -> "Article",
    "interactive tutorial" -> "Other",
    "journal" -> "Other",
    "journal article" -> "Article",
    "journal-article" -> "Article",
    "journal-issue" -> "Other",
    "legal case" -> "Other",
    "meta-analysis" -> "Article",
    "monograph" -> "Book",
    "multicenter study" -> "Other",
    "network meta-analysis" -> "Article",
    "observational study" -> "Other",
    "other" -> "Other",
    "overall" -> "Other",
    "portrait" -> "Other",
    "posted-content" -> "Other",
    "practice guideline" -> "Other",
    "pragmatic clinical trial" -> "Other",
    "proceedings" -> "Other",
    "proceedings-article" -> "Article",
    "randomized controlled trial" -> "Other",
    "reference-book" -> "Other",
    "reference-entry" -> "Other",
    "report" -> "Other",
    "report-component" -> "Other",
    "report-series" -> "Other",
    "research support, american recovery and reinvestment act" -> "Other",
    "research support, n.i.h., extramural" -> "Other",
    "research support, n.i.h., intramural" -> "Other",
    "research support, non-u.s. gov't" -> "Other",
    "research support, u.s. gov't, non-p.h.s." -> "Other",
    "research support, u.s. gov't, p.h.s." -> "Other",
    "scoping review" -> "Article",
    "standard" -> "Other",
    "systematic review" -> "Article",
    "technical report" -> "Other",
    "twin study" -> "Other",
    "validation study" -> "Other",
    "video-audio media" -> "Other",
    "webcast" -> "Other",
    "abstract" -> "Other",
    "address" -> "Other",
    "art and literature" -> "Other",
    "article" -> "Article",
    "bibliography" -> "Other",
    "biography" -> "Book",
    "case reports" -> "Other",
    "casestudy" -> "Other",
    "chapter" -> "Chapter",
    "congress" -> "Other",
    "correction" -> "Correction/Retraction",
    "data paper" -> "Article",
    "data set" -> "Dataset",
    "data study" -> "Other",
    "dictionary" -> "Other",
    "early access" -> "Article",
    "editorial" -> "Editorial Material ",
    "editorial material" -> "Editorial Material ",
    "erratum" -> "Correction/Retraction",
    "expression of concern" -> "Correction/Retraction",
    "festschrift" -> "Book",
    "inbook" -> "Chapter",
    "inproceedings" -> "Article",
    "interview" -> "Other",
    "introductory journal article" -> "Other",
    "item withdrawal" -> "Correction/Retraction",
    "lecture" -> "Other",
    "letter" -> "Other",
    "libguides" -> "Other",
    "meeting" -> "Other",
    "news" -> "Other",
    "otherpaper" -> "Other",
    "paratext" -> "Other",
    "patient education handout" -> "Other",
    "peer-review" -> "Other",
    "personal narrative" -> "Other",
    "preprint" -> "Preprint",
    "proceeding" -> "Article",
    "publication with expression of concern" -> "Correction/Retraction",
    "published erratum" -> "Correction/Retraction",
    "retracted publication" -> "Correction/Retraction",
    "retraction" -> "Correction/Retraction",
    "retraction notice" -> "Correction/Retraction",
    "review" -> "Article",
    "seminar" -> "Other",
    "supplementary-materials" -> "Other",
    "technicalreport" -> "Other",
    "withdrawn publication" -> "Correction/Retraction",
    "workingpaper" -> "Other"
  )

  private lazy val mappingCol: Column = typedlit(mapping)

  /** Python str.capitalize(): first char upper, rest lower. */
  def capitalize(c: Column): Column =
    concat(upper(substring(c, 1, 1)), lower(substring(c, 2, Int.MaxValue)))

  /** _normalize_type: mapping lookup on the lowercased value, else
    * capitalize.
    */
  def normalizeType(c: Column): Column =
    coalesce(element_at(mappingCol, lower(c)), capitalize(c))

  /** types(): normalize each element, dedupe, sort (types.py:31). */
  def normalizeTypes(arr: Column): Column =
    array_sort(array_distinct(transform(arr, normalizeType _)))
}
