"""dragnet_spark — a PySpark-native rebuild of the vkond/dragnet
incoherent-dedispersion pipeline (reference at /root/reference, read-only).

The engine operates over tables of interleaved documents
``(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)``:
one document = one observation's dynamic spectrum encoded as sample
strips plus interleaved media spans.  The numeric core is a single fused
Arrow-batched kernel (``kernels.py``) shared verbatim between the NumPy
oracle (``oracle.py``) and the Spark pipeline (``pipeline.py``), so
span-sequence equality between the two holds by construction; the
kernels themselves are validated against hand-computed micro-cases that
transcribe the reference C code (cited per function).
"""

__version__ = "0.1.0"
