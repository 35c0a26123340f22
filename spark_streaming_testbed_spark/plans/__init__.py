from .phases import (  # noqa: F401
    CyclePhase,
    DataAtTime,
    FixedPhase,
    LoopPhase,
    NoopPhase,
    Phase,
    RampPhase,
    TestPlan,
    parse_plan,
)
