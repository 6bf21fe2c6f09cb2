from .base import OdeSystem, get_system, register, registered_systems  # noqa: F401
from .systems import (  # noqa: F401
    FN_SYSTEM,
    HES1_SYSTEM,
    HES1LOG_FIXF_SYSTEM,
    HES1LOG_FIXG_SYSTEM,
    HES1LOG_SYSTEM,
    HIV_SYSTEM,
    PTRANS_SYSTEM,
    fn_f,
    fn_f_dtheta,
    fn_f_dx,
    hes1_f,
    hes1_f_dtheta,
    hes1_f_dx,
    hes1log_f,
    hiv_f,
    ptrans_f,
)
