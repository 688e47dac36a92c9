from maxstyle_tpu.ops import intensity  # noqa: F401
