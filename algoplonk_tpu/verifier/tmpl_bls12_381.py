"""BLS12-381 PuyaPy verifier template (filled in the codegen stage)."""


def render(vk, contract_type):
    raise NotImplementedError("BLS12-381 verifier template lands with the codegen stage")
