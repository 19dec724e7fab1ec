"""Large-scale training-data pipeline operators.

Beyond the reference's own surface (SURVEY.md §2), these are the
operations a 100 TB corpus-preparation pipeline needs: deduplication
(exact, MinHash+LSH, SimHash, n-gram Jaccard), embedding similarity
search (brute-force + IVF), text analysis (language ID, quality scores,
token counts, fingerprints), and multimodal column plumbing.
"""
