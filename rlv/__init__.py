"""rlv — verified-semantics columnar compression engine on PySpark.

Blueprint: SURVEY.md. Reference semantics: CharlesCNorton/RunLength-Verified
(/root/reference/rl_encoding.v), re-expressed as numpy kernels + Spark passes.
"""

__version__ = "0.1.0"
