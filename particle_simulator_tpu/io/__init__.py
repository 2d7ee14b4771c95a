from particle_simulator_tpu.io.frame import (  # noqa: F401
    DataStructure,
    Device,
    Frame,
    FrameMetadata,
    MieParams,
    HEADER_DTYPE,
    HEADER_SIZE,
    METADATA_DTYPE,
    PARTICLE_DTYPE,
    PARTICLE_SIZE,
    SIGNATURE_END,
    SIGNATURE_START,
    default_metadata,
    packet_size,
)
from particle_simulator_tpu.io.transport import (  # noqa: F401
    Disconnected,
    Reader,
    Writer,
    new_tcp_client,
    new_tcp_server,
)
