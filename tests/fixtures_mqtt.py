"""MQTT dump fixtures (data records from the reference replay corpora —
inputtests/TTN-testsuite.mqtt — plus synthetic V3 variants)."""

V2_PORT2 = (
    '201802215971az/devices/lopyprototype20180404/up '
    '{"app_id":"201802215971az","dev_id":"lopyprototype20180404",'
    '"hardware_serial":"D4973556E6375616","port":2,"counter":19942,'
    '"payload_raw":"hQAAAJsArgF4A3oD+gEOAJw=",'
    '"metadata":{"time":"2020-11-07T23:48:20.220189142Z","airtime":71936000,'
    '"gateways":[{"gtw_id":"eui-7276ff000b032609","rssi":-123,"snr":-6.2,'
    '"latitude":51.44634,"longitude":5.48512}]}}'
)

V2_PORT4 = (
    '201802215971az/devices/bwlvc-9cd5/up '
    '{"app_id":"201802215971az","dev_id":"bwlvc-9cd5",'
    '"hardware_serial":"AAAAB4E62DF49CD5","port":4,"counter":14382,'
    '"payload_raw":"jwDcAV4BmoADeMctaQMPAIkANAF6A2ED/QEMAR8ATr4SAAj1GgAAAVw=",'
    '"metadata":{"time":"2020-11-07T23:49:01.38602329Z","airtime":102656000,'
    '"gateways":[{"gtw_id":"gateway_sint_anthonis_003","rssi":-102,"snr":7},'
    '{"gtw_id":"gateway_sint_anthonis_001","rssi":-110,"snr":3.5}]}}'
)

V2_PORT3 = (
    '201802215971az/devices/salk-20190905/up '
    '{"app_id":"201802215971az","dev_id":"salk-20190905",'
    '"hardware_serial":"70B3D54997989D55","port":3,"counter":4149,'
    '"payload_raw":"BUwATsZmAAj46gAAAQs=",'
    '"metadata":{"time":"2021-08-20T04:06:30.08667089Z","airtime":66816000,'
    '"gateways":[{"gtw_id":"gateway_sint_anthonis_001","rssi":-116,"snr":-3.75}]}}'
)

# same port-2 payload wrapped in a TTN V3 envelope (synthetic)
V3_PORT2 = (
    'v3/app1@ttn/devices/lopy-v3/up '
    '{"end_device_ids":{"device_id":"lopy-v3","dev_eui":"D4973556E6375616",'
    '"application_ids":{"application_id":"app1"}},'
    '"received_at":"2021-09-01T10:00:00.5Z",'
    '"uplink_message":{"f_port":2,"f_cnt":77,'
    '"frm_payload":"hQAAAJsArgF4A3oD+gEOAJw=",'
    '"received_at":"2021-09-01T10:00:00.5Z",'
    '"rx_metadata":[{"gateway_ids":{"gateway_id":"gw-v3-1"},"rssi":-90,"snr":9.5}]}}'
)

ALL_LINES = [V2_PORT2, V2_PORT4, V2_PORT3, V3_PORT2]
