from python_hll_spark.sketches.hll import HLLConfig, HLLSketch, HLLType  # noqa: F401
