from linearham_tpu.models.simple_hmm import SimpleHMM  # noqa: F401
from linearham_tpu.models.decode import Annotation  # noqa: F401
