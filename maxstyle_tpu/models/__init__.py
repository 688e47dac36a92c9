from maxstyle_tpu.models import layers  # noqa: F401
from maxstyle_tpu.models import encoder_decoder  # noqa: F401
from maxstyle_tpu.models import registry  # noqa: F401
