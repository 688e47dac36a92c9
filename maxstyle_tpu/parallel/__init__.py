from maxstyle_tpu.parallel import mesh  # noqa: F401
