"""basicocr_spark — a PySpark-native main-content extraction engine.

A from-scratch re-expression of the capabilities of the reference repo
(tongpi/basicOCR, a scene-text OCR research codebase) as set-level Spark
operators over tables of interleaved text+media documents:

- CTC greedy decode recognition (reference: contrib/crnn/utils.py:66-101)
  as a pure Catalyst column expression (and a vectorized numpy cross-check).
- Dictionary correction with exact reference tie-break semantics
  (reference: contrib/trietree/src/trietree_correct.py) as a broadcast
  levenshtein theta-join + window top-1.
- Boilerplate stripping / stop-content removal (reference analogs:
  contrib/acautomata Test.java, trietree wordFrequency/readData.py) as
  column math over parsed blocks.
- Anchor-proposal + line grouping (reference: docs SegLink/TextBoxes
  analyses) as per-doc vectorized union-find.
- Plus the large-scale training-data-pipeline operators a 100 TB corpus
  needs: dedup (exact/minhash/simhash/jaccard), similarity search,
  text quality stats, multimodal column plumbing.

Design rules (see SURVEY.md §7): DataFrame-first, zero per-row Python,
Arrow-batched UDFs only where column expressions cannot express the
semantics, broadcast every dictionary-sized side, never split a document
across partitions.
"""

__version__ = "0.1.0"
