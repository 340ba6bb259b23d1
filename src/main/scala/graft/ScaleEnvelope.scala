package graft

/** Typed refusal for brute/exact BASELINE kernels driven past their
  * declared compute envelope (e.g. [[operators.Similarity.maxExactVectors]]
  * for the O(n²) all-pairs cosine baseline).
  *
  * The envelope is part of the operator's contract, not a failure: the
  * exact form exists to prove the scalable form correct, and past the
  * envelope that proof is carried by the operator's deterministic
  * bounded-sample twin ([[SparkEntry.bruteOracleDelegates]]). Throwing a
  * typed exception (instead of a bare require) lets [[Verify]] record
  * the refusal as a machine-readable `_ENVELOPE.json` marker in the dump
  * dir, which tools/selfcheck.py --scale resolves mechanically: the row
  * passes iff its declared sample twin passed exact in the same sweep —
  * a crashed query, by contrast, writes no marker and fails the sweep's
  * completeness check. First fired for real by the r14 sf3 sweep:
  * doc_embedding_exact's 150k vectors vs the 2^17 cap. */
class ScaleEnvelopeExceeded(msg: String) extends IllegalArgumentException(msg)
