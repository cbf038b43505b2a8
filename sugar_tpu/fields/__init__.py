from sugar_tpu.fields.knn import knn  # noqa: F401
from sugar_tpu.fields import density  # noqa: F401
