from sugar_tpu.core import sh, quaternions, transforms, cameras  # noqa: F401
