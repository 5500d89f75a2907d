// Empty shim: the reference includes <boost/date_time.hpp> but uses no
// date_time symbols (grep over /root/reference/src finds only boost::bind
// and boost::thread_group).
#pragma once
