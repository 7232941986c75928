"""Training-data pipeline operators over document/embedding tables:
deduplication (exact, minhash-LSH, simhash), text analysis (token
counts, quality scoring, language ID, fingerprinting), and similarity
search (brute-force + LSH-bucketed ANN). All JVM-side DataFrame
expressions where possible; Arrow-vectorized UDFs otherwise."""
