"""Engine operators: relational helpers + LLM-data-pipeline operators.

Everything here is expressed as DataFrame -> DataFrame transformations built
from JVM-side column expressions (whole-stage codegen'd), so Catalyst can
push filters, prune columns, and pick join strategies around them. Python
UDFs appear only where semantics genuinely require them (multimodal decode),
and then as Arrow-batched Pandas UDFs.
"""
