from tomofastx_tpu.models.grid import Grid  # noqa: F401
from tomofastx_tpu.models.data import SurveyData  # noqa: F401
from tomofastx_tpu.models.model import ModelState  # noqa: F401
