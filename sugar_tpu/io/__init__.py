from sugar_tpu.io import ply  # noqa: F401
