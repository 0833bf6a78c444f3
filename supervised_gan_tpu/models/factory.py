"""Model recipe factory — string dispatch identical to reference
models/models.py:2-44, plus 'cgan_causal' (present in the reference tree but
never registered in its factory; registered here so the capability is
reachable)."""


def create_model(opt):
    if getattr(opt, 'data_mesh', 0) or getattr(opt, 'spatial_mesh', 0):
        # pallas_call does not auto-partition under pjit: the streaming
        # IN kernels (N-batched grids) must not see mesh-global shapes.
        # The conv kernels self-gate on n == 1 / full-height geometry.
        from ..ops.pallas import instance_norm as _sin
        _sin._IN_STREAM = False
    model = None
    print(opt.model)
    if opt.model == 'fcgan':
        assert opt.dataset_mode == 'single'
        from .fcgan import FCGANModel
        model = FCGANModel()
    elif opt.model == 'cgan':
        from .cgan import CGANModel
        model = CGANModel()
    elif opt.model == 'cgan2':
        from .cgan2 import CGAN2Model
        model = CGAN2Model()
    elif opt.model == 'cgan_cycle':
        from .cgan_cycle import CGANCycleModel
        model = CGANCycleModel()
    elif opt.model == 'cgan2_cycle':
        from .cgan2_cycle import CGAN2CycleModel
        model = CGAN2CycleModel()
    elif opt.model == 'cgan_causal':
        from .cgan_causal import CGANCausalModel
        model = CGANCausalModel()
    elif opt.model == 'twostage':
        from .twostage import TwoStageModel
        model = TwoStageModel()
    elif opt.model == 'twostage_cycle':
        from .twostage_cycle import TwoStageCycleModel
        model = TwoStageCycleModel()
    elif opt.model == 'twostage_factd':
        from .twostage_factd import TwoStageFactDModel
        model = TwoStageFactDModel()
    elif opt.model == 'test':
        assert opt.dataset_mode == 'single'
        from .test_model import TestModel
        model = TestModel()
    elif opt.model == 'segmentation':
        from .segmentation import SegmentationModel
        model = SegmentationModel()
    elif opt.model == 'segmentation_cycle':
        from .segmentation_cycle import SegmentationCycleModel
        model = SegmentationCycleModel()
    else:
        raise ValueError("Model [%s] not recognized." % opt.model)
    model.initialize(opt)
    print("model [%s] was created" % model.name())
    return model
