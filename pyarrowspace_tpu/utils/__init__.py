from .debug import (dbg_println, debug_enabled, get_phase_timings, phase,
                    set_debug)
