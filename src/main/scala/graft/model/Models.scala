package graft.model

/** Typed record families of the engine (SURVEY.md §1.1).
  *
  * These mirror the reference's Pydantic models (reference
  * `lovdata_pipeline/domain/models.py:60-164,206-221,252-257`) as Spark-friendly
  * case classes: flat, encoder-derivable, with arrays for the two list-typed
  * columns (`crossRefs`, `embedding`).
  */

/** A unit of work emitted by the CDC scan (reference `domain/models.py:156-164,206-214`). */
final case class FileRecord(
    docId: String,
    path: String,
    dataset: String,
    hash: String,
    status: String // added | modified | removed | unchanged
)

/** Tombstone for delete-by-document cleanup (reference `domain/models.py:217-221,51-57`). */
final case class Tombstone(docId: String, dataset: String)

/** Parser-level chunk, before pipeline metadata projection
  * (reference `domain/models.py:140-148`; the open metadata dict's known keys
  * are modeled as typed fields — SURVEY §1.2).
  *
  * `chunkIndex` is the stable within-document position — carried explicitly so
  * the positional id rewrite (C11) never depends on row order after a shuffle.
  */
final case class Chunk(
    chunkId: String,
    chunkIndex: Int,
    text: String,
    tokenCount: Int,
    paragraphRef: String,
    paragraphTitle: String,
    sectionHeading: String,
    documentTitle: String,
    chapterPath: Seq[String],
    address: String,
    url: String,
    crossRefs: Seq[String],
    leddNumber: Int,
    merged: Boolean,
    mergedWith: Seq[String]
)

/** The canonical stored chunk row (reference `domain/models.py:60-89`). */
final case class ChunkRow(
    chunkId: String,
    documentId: String,
    datasetName: String,
    content: String,
    tokenCount: Int,
    sectionHeading: String,
    absoluteAddress: String,
    splitReason: String,
    parentChunkId: Option[String],
    sourceHash: String,
    crossRefs: Seq[String],
    chunkIndex: Int
)

/** Chunk + embedding vector (reference `domain/models.py:91-132`). */
final case class EnrichedChunkRow(
    chunkId: String,
    documentId: String,
    datasetName: String,
    content: String,
    tokenCount: Int,
    sectionHeading: String,
    absoluteAddress: String,
    splitReason: String,
    parentChunkId: Option[String],
    sourceHash: String,
    crossRefs: Seq[String],
    chunkIndex: Int,
    embedding: Seq[Float],
    embeddingModel: String,
    embeddedAt: String
)

/** One row of the incremental-processing ledger
  * (reference `domain/models.py:252-257`, `state.py:1-14`).
  */
final case class StateRow(
    docId: String,
    hash: String,
    status: String, // processed | failed
    at: String,
    error: Option[String]
)
