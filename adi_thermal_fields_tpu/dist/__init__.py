from .gather import gather_to_host, is_output_process
