"""PySpark-native opinion-analysis / transcript-indexing engine.

A from-scratch Structured-Streaming reimplementation of the capabilities of
GoogleCloudPlatform/dataflow-opinion-analysis (reference at /root/reference,
v0.7.0) over a table of multi-turn conversation transcripts
(conv_id, turn_idx, role, text, tool, ts).

Everything here is DataFrame/SQL-first: Catalyst plans the physical
execution; Python only appears inside Arrow-vectorized pandas UDFs
(the NLP scorer and grouped thread/dedupe logic).
"""

__version__ = "0.1.0"
