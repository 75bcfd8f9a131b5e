from .synthetic import (
    generate_data_numpy,
    generate_quantum_gp_data,
    save_quantum_dataset,
)
from .partition import sample_agent_data_percentage, split_data_numpy
from .real_world import (
    get_dataset_info,
    get_tile_for_region,
    load_real_world_dataset,
    load_robot_push_dataset,
    load_sea_surface_temperature,
    load_srtm_elevation_dataset,
    read_hgt_file,
)
