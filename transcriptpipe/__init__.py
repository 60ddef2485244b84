"""transcriptpipe — a PySpark-native parse → enrich → route → aggregate pipeline.

A from-scratch reimagining of the capabilities of Scribery/aushape
(reference at /root/reference, surveyed in SURVEY.md) applied to tables of
multi-turn conversation/agent transcripts:

* vectorized grok/kv field extraction + hex decoding   (parse.py,   ref lib/record.c, lib/execve_coll.c)
* per-conversation event coalescing with collectors    (coalesce.py, ref lib/conv_buf.c, lib/*_coll.c)
* broadcast-dictionary enrichment                      (enrich.py,  ref auparse interpret, lib/field.c:112-114)
* JSON/XML document rendering + size-capped trimming   (render.py,  ref lib/gbtree.c trim, lib/gbuf.c escape)
* router fan-out to per-doctype sinks + metrics        (route.py, metrics.py, ref lib/output.c, lib/conv.c)
* snapshot-checkpointed, resumable writes              (sinks.py,   new design; north_rule requirement)

Everything here is built on the public PySpark DataFrame API; no code is
copied from the reference (which is C).
"""

__version__ = "0.1.0"
