"""PySpark-native analytics engine with the query and data-processing
capabilities of VadimGrozinok/solana-snapshot-etl-tools.

The reference is a Rust batch+streaming ETL over Solana snapshot state
(see SURVEY.md). This engine re-expresses it Spark-first:

- ``sources``    : snapshot ingestion (archive / unpacked / appendvec walk)
- ``operators``  : payload decoders, selectors, dedup, similarity,
                   opcode stats, multimodal plumbing
- ``functions``  : binary-layout column expressions, base58, text analysis
- ``plans``      : batch table builds + the relational query corpus
- ``streaming``  : geyser-parity structured-streaming pipelines

Everything is DataFrame/Catalyst-native; pandas UDFs only where a
variable-length decode genuinely cannot be a column expression
(Borsh metadata, eBPF disassembly).
"""

__version__ = "0.1.0"
