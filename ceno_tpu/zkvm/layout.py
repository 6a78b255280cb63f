"""zkVM layout constants: public-value slots, lookup tags, timestamp model.

Mirror of the reference's PublicValues (scheme.rs:92-104) and the 4-subcycle
timestamp model (tracer.rs:306). Public values are instance slots shared by
every chip's constraint system.
"""

# public value indices
PV_INIT_PC = 0
PV_END_PC = 1
PV_INIT_CYCLE = 2
PV_END_CYCLE = 3
PV_EXIT_CODE_LO = 4
PV_EXIT_CODE_HI = 5
N_PUBLIC_VALUES = 6

TS_MAX_BITS = 28  # cur_ts - prev_ts - 1 decomposes into u16 + u12
