from gym_fishing_tpu.agents.policies import escapement, msy, surplus_production_msy, user_action
